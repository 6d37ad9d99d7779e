#!/usr/bin/env python3
"""Cross-engine sentiment fuzz: generate adversarial texts (caps,
punctuation, boosters, negation phrases, but-clauses, n't suffixes,
pipes, weird whitespace), score them with the Spark native expression
(via graft.tools.SentFuzz) and with the generated DuckDB oracle, and
compare value-exactly. Run: python3 tools/sent_fuzz.py [seed]"""
import os, random, subprocess, sys, glob
import duckdb
import pyarrow.parquet as pq

os.chdir("/root/repo")  # all corpus/output paths are repo-relative

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1234
rng = random.Random(seed)

POS = ["good", "great", "love", "happy", "win", "nice", "fast", "superb"]
NEG = ["bad", "terrible", "hate", "fail", "slow", "worst", "broken", "doubt"]
BOOST = ["very", "really", "so", "extremely", "hardly", "slightly",
         "barely", "most", "utterly", "VERY", "REALLY", "SO"]
NEGATORS = ["not", "never", "cannot", "dont", "isn't", "wasn't", "won't",
            "without", "rarely", "seldom", "couldn't", "NOT", "Never"]
FILLER = ["the", "a", "it", "was", "this", "that", "at", "least", "but",
          "so", "this", "doubt", "stuff", "code", "x", "|pipe", "#tag",
          "@user", "n't", "BUT", "AT", "LEAST",
          # idiom / phrase-booster fragments: random adjacency assembles
          # full idioms ("the shit", "to die for", "kind of", ...) at
          # arbitrary offsets relative to lexicon anchors
          "kind", "sort", "of", "just", "enough", "to", "die", "for",
          "yeah", "right", "heart", "beating", "bomb", "shit", "KIND",
          "OF", "DIE"]
PUNCT = ["!", "!!", "!!!", "!!!!", "!!!!!", "?", "??", "???", "????",
         "?!", "!?", "...", ",", ".", "good!", "bad!!", "GOOD?!",
         "(good)", "'bad'", "\"great\"", "bad...", "!leading"]

def make_text(i):
    n = rng.randint(0, 14)
    pools = [POS, NEG, BOOST, NEGATORS, FILLER, PUNCT]
    toks = [rng.choice(rng.choice(pools)) for _ in range(n)]
    if i % 7 == 0:
        toks.insert(rng.randint(0, max(1, len(toks))), "but")
    if i % 11 == 0:
        toks = [t.upper() for t in toks]  # all-caps text: NO cap differential
    return " ".join(toks)

docs = [(i, make_text(i), "en", "fuzz", 10) for i in range(400)]
# hand-picked hard cases
hard = [
    "never so good", "never this good", "without doubt good",
    "it was least slow", "it at least slow", "at least good",
    "VERY good stuff", "GOOD STUFF", "good but bad", "BAD but GOOD now",
    "hasn't been good", "ain't bad at all", "really really really great",
    "good !! ?? !!", "????", "!!!!", "so so so good", "more or less fine",
    "not not good", "never never bad", "|pipe not good", "xن't good",
    "don't don't don't hate", "NOT GOOD", "very VERY good",
    # idioms + two-token booster phrases (_special_idioms_check)
    "pad to die for good", "pad sort of good", "pad kind of good",
    "pad just enough good", "pad pad pad broken heart",
    "pad pad pad beating heart", "was the shit good", "it the bomb great",
    "pad yeah right good", "not to die for good", "never to die for good",
    "pad KIND OF good", "pad sort of GOOD", "sort of good",
    "pad kiss of death bad", "to die for", "broken heart",
    "pad to die for good but bad", "hardly sort of good !!",
]
docs += [(1000 + j, t, "en", "fuzz", 10) for j, t in enumerate(hard)]

os.makedirs("target/fuzz", exist_ok=True)
con = duckdb.connect()
con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", docs)
con.execute("COPY d TO 'target/fuzz/documents.parquet' (FORMAT PARQUET)")

r = subprocess.run(
    ["sbt", "-batch", "runMain graft.tools.SentFuzz target/fuzz target/fuzz-out"],
    capture_output=True, text=True, cwd="/root/repo")
if r.returncode != 0:
    print(r.stdout[-3000:], r.stderr[-2000:]); sys.exit(1)

spark = pq.read_table(glob.glob("target/fuzz-out/*.parquet")[0]).to_pylist()
con2 = duckdb.connect()
con2.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('target/fuzz/documents.parquet')")
oracle_sql = open("target/fuzz-out/oracle.sql").read()
oracle = con2.execute(oracle_sql).fetch_arrow_table().to_pylist()

bad = 0
texts = {d[0]: d[1] for d in docs}
for s, o in zip(sorted(spark, key=lambda r: r["doc_id"]),
                sorted(oracle, key=lambda r: r["doc_id"])):
    for k in ("tb", "vader", "sentiment", "polarity"):
        if s[k] != o[k]:
            bad += 1
            print(f"DIVERGE doc {s['doc_id']} [{k}]: spark={s[k]} oracle={o[k]}")
            print(f"  text: {texts[s['doc_id']]!r}")
            break
print(f"== {len(spark)} docs compared, {bad} divergences (seed {seed}) ==")
sys.exit(1 if bad else 0)
