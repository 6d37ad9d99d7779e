#!/usr/bin/env python3
"""Adversarial-corpus fuzz over every documents-only operator: generate a
nasty documents table (unicode, empty/huge/duplicate docs, punctuation,
mixed case), run the Spark queries (graft.Verify with a name filter) and
the DuckDB oracles over the SAME table, compare exactly.

Two corpora:
 - "nasty" (unicode/case/punct/empties) for the text/sentiment/dedup
   family, whose oracles share the engines' builtin lower()/split().
 - "plain" (lowercase ASCII words + empties + duplicate clusters) for the
   analyzer-path queries (q6x): the SQL analyzer equivalence is
   documented as exact only on space-separated plain words (CodeAnalyzer
   additionally splits camelCase and intra-token punctuation).

Known, documented cross-engine caveat (kept OUT of the generator): the
Turkish dotted capital İ (U+0130) lowercases to 'i̇' (i + combining dot)
in the JVM but to plain 'i' in DuckDB — the one casefold divergence found
by probing; oracles over İ-bearing text are inapplicable.

Run: python3 tools/docs_fuzz.py [seed]"""
import os, random, shutil, subprocess, sys
import duckdb

os.chdir("/root/repo")  # all corpus/output paths are repo-relative

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 99
rng = random.Random(seed)

WORDS = ("the quick brown fox spark query join merge sort hash scan index "
         "table window batch stream key order part dup not good bad very "
         "really never so this without doubt least at but win giveaway "
         "en de fr http https").split()
EXOTIC = ["café", "straße", "日本語", "ÜBER",
          "naïve", "\U0001F600", "x́", "istanbul", "|pipe",
          "#tag", "@user", "don't", "o'brien", "a,b", "(x)", "100", "3.14",
          "a" * 300]

def make_text(i, exotic):
    if i % 29 == 0:
        return ""  # empty doc
    if i % 31 == 0:
        return "solo"
    if i % 23 == 0:  # huge doc
        return " ".join(rng.choice(WORDS) for _ in range(1500))
    n = rng.randint(1, 40)
    pool = WORDS + EXOTIC if exotic else WORDS
    toks = [rng.choice(pool if rng.random() < 0.3 else WORDS)
            for _ in range(n)]
    if exotic and i % 13 == 0:
        toks = [t.upper() if rng.random() < 0.5 else t for t in toks]
    if exotic and i % 17 == 0:
        toks.append(rng.choice(["!", "!!", "??", "good!", "bad?!"]))
    return " ".join(toks)

def corpus(exotic):
    docs = []
    for i in range(300):
        docs.append((i, make_text(i, exotic), rng.choice(["en", "de", "fr"]),
                     rng.choice(["web", "api"]), rng.randint(5, 100)))
    # a boilerplate cluster (40 identical docs) to exercise the band cap,
    # plus a near-dup pair
    boiler = ("generated do not edit this header file at all ever " * 3).strip()
    for j in range(40):
        docs.append((500 + j, boiler, "en", "gen", 50))
    base = make_text(7, exotic) + " alpha beta gamma delta epsilon zeta eta theta"
    docs.append((600, base, "en", "web", 50))
    # mutation stays a plain letters-only word: a digit (e.g. "beta2")
    # would leave the documented analyzer-equivalence domain (CodeAnalyzer
    # splits letter/digit boundaries; the SQL twin keeps whole tokens)
    docs.append((601, base.replace("beta", "betax"), "en", "web", 50))
    return docs

def write(dirname, docs):
    os.makedirs(dirname, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", docs)
    con.execute(f"COPY d TO '{dirname}/documents.parquet' (FORMAT PARQUET)")
    con.close()

def run(dirname, out, names):
    shutil.rmtree(out, ignore_errors=True)  # no stale parquet can mask a failure
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {dirname} {out} " + " ".join(names)],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-2000:]); sys.exit(1)
    fails = [l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l]
    for l in fails:
        print(l)
    v = subprocess.run(
        ["python3", "tools/verify_local.py", dirname, out],
        capture_output=True, text=True, cwd="/root/repo")
    print(v.stdout[-4000:])
    return v.returncode or (1 if fails else 0)

NASTY = ["q03", "q20", "q21", "q22", "q23", "q24", "q25", "q27", "q28",
         "q30", "q31", "q32", "q33", "q34", "q35", "q36",
         "q40", "q41", "q42", "q43", "q44", "q45", "q46", "q47", "q48", "q49",
         # media pipelines: q70 hits the UTF-8 byte path (exotic texts ->
         # multi-byte payloads), q71/q72 the WAV/PPM decode roundtrips
         # over fuzzed doc_id / n_chars
         "q70", "q71", "q72", "q73"]
# q74 = WHERE match(): the semi-join rewrite (Spark) vs re-tokenization
# (DuckDB) must agree on hit SETS over empties/huge docs/dup clusters
PLAIN = ["q60", "q61", "q62", "q63", "q64", "q65", "q66", "q74", "q75"]

write("target/docsfuzz", corpus(exotic=True))
write("target/docsfuzz-plain", corpus(exotic=False))
rc1 = run("target/docsfuzz", "target/docsfuzz-out", NASTY)
rc2 = run("target/docsfuzz-plain", "target/docsfuzz-plain-out", PLAIN)
sys.exit(rc1 or rc2)
