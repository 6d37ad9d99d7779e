#!/usr/bin/env python3
"""Adversarial events + embeddings fuzz: tie-heavy timestamps, zero and
negative values, bursty users, duplicate/zero/extreme vectors — through
every events- and embeddings-based query vs the DuckDB oracles.
Run: python3 tools/tables_fuzz.py [seed]"""
import os, random, shutil, subprocess, sys, datetime
import duckdb

os.chdir("/root/repo")  # all corpus/output paths are repo-relative

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
rng = random.Random(seed)
base = datetime.datetime(2024, 3, 1, 0, 0, 0)

TYPES = ["click", "view", "signup", "purchase"]
events = []
for i in range(3000):
    # HEAVY ts ties: only 40 distinct timestamps (row_number/lag/asof
    # tie-break paths), incl. sub-second offsets
    ts = base + datetime.timedelta(seconds=rng.randint(0, 39),
                                   microseconds=rng.choice([0, 0, 500000]))
    user = rng.choice([1, 2, 3, 42])  # bursty: 4 users for 3000 events
    val = rng.choice([0.0, -1.5, 2.25, 1e9, -1e-9,
                      rng.uniform(-100, 100)])
    events.append((i, ts, user, rng.choice(TYPES), round(val, 6),
                   '{"k": %d}' % rng.randint(0, 3)))
# an isolated user with exactly one event (window edge)
events.append((90000, base, 999, "signup", 0.0, '{"k": 0}'))

DIM = 64
def vec(kind):
    if kind == "zero":
        return [0.0] * DIM
    if kind == "tiny":
        return [1e-30] * DIM
    if kind == "big":
        return [float(rng.choice([1e15, -1e15])) for _ in range(DIM)]
    return [round(rng.uniform(-1, 1), 4) for _ in range(DIM)]

embs = []
for v in range(200):
    kind = "normal"
    if v in (30, 31):
        kind = "zero"   # zero vectors: cosine must be NULL, never throw
    elif v == 40:
        kind = "tiny"
    elif v in (50, 51):
        kind = "big"
    embs.append((v, vec(kind), v % 7))
embs.append((201, embs[5][1], 1))  # exact duplicate of vec 5
# duplicate of a SEED CENTROID (vec_id < 16): nearest-centroid tie-break
embs.append((202, embs[3][1], 2))

docs = [(i, "alpha beta gamma", "en", "web", 10) for i in range(5)]

os.makedirs("target/tablesfuzz", exist_ok=True)
con = duckdb.connect()
con.execute("CREATE TABLE e(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)")
con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", events)
con.execute("COPY e TO 'target/tablesfuzz/events.parquet' (FORMAT PARQUET)")
con.execute("CREATE TABLE v(vec_id BIGINT, embedding FLOAT[], label INTEGER)")
con.executemany("INSERT INTO v VALUES (?,?,?)", embs)
con.execute("COPY v TO 'target/tablesfuzz/embeddings.parquet' (FORMAT PARQUET)")
con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", docs)
con.execute("COPY d TO 'target/tablesfuzz/documents.parquet' (FORMAT PARQUET)")

names = ["q04", "q05", "q06", "q07", "q08", "q09", "q10", "q14", "q15",
         "q16", "q17", "q18", "q19", "q26", "q37", "q70",
         "q50", "q51", "q52", "q53", "q54", "q55", "q56"]
shutil.rmtree("target/tablesfuzz-out", ignore_errors=True)  # no stale parquet
r = subprocess.run(
    ["sbt", "-batch",
     "runMain graft.Verify target/tablesfuzz target/tablesfuzz-out " + " ".join(names)],
    capture_output=True, text=True, cwd="/root/repo",
    env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
if r.returncode != 0:
    print(r.stdout[-3000:], r.stderr[-2000:]); sys.exit(1)
fails = [l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l]
for l in fails:
    print(l)
v = subprocess.run(
    ["python3", "tools/verify_local.py", "target/tablesfuzz", "target/tablesfuzz-out"],
    capture_output=True, text=True, cwd="/root/repo")
print(v.stdout[-4000:])
sys.exit(v.returncode or (1 if fails else 0))
