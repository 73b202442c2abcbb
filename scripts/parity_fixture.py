#!/usr/bin/env python3
"""Degenerate-vector oracle-parity fixture (round 12).

Builds a variant of /root/testdata/sf0.001 whose embeddings table contains
degenerate vectors — a zero-norm QUERY vector (vec_id 19), plus corpus-side
zero-norm / empty / NULL rows — then the caller runs the full Verify +
compare.py gate over it. This pins engine<->oracle lockstep on exactly the
degenerate class the NULL guards were added for (ADVICE r11: the x13 oracle
had drifted — a NULL-e corpus vector still landed in `assigned` via the cid
tiebreak while the engine dropped it).

Deliberately NOT covered: dimension-mismatched vectors. DuckDB's
list_dot_product raises on unequal list lengths, so a mixed-dim corpus cannot
flow through the SQL oracles at all; the engine's NULL-on-mismatch contract
is pinned engine-side in VectorOpsSpec instead.

Usage:
    python3 scripts/parity_fixture.py [outdir]      # default /tmp/parity_fixture
then:
    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify <outdir> /tmp/parity_out"
    python3 scripts/compare.py /tmp/parity_out <outdir>
"""
import shutil, sys, os
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_fixture"
os.makedirs(out, exist_ok=True)

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

# --- documents: degenerate TEXT rows (round-12 session 2) ---------------
# NULL / empty / whitespace-only text exercises every text operator's
# degenerate path in BOTH engines at once. Ids sit far above the live range
# and off every privileged slice: none are % 50 == 0 (x22 benchmark, x60
# query sheet), and the x23 tier parse needs a well-formed 'src<int>'.
docs = pq.read_table(f"{SRC}/documents.parquet")
dcols = {c: docs.column(c).to_pylist() for c in docs.column_names}
src0 = dcols["source"][0]
lang0 = dcols["lang"][0]
for did, txt in [(9001, None), (9002, ""), (9003, " ")]:
    dcols["doc_id"].append(did)
    dcols["text"].append(txt)
    dcols["lang"].append(lang0)
    dcols["source"].append(src0)
    dcols["n_chars"].append(0 if txt is None else len(txt))
pq.write_table(pa.table({
    "doc_id": pa.array(dcols["doc_id"], pa.int64()),
    "text": pa.array(dcols["text"], pa.string()),
    "lang": pa.array(dcols["lang"], pa.string()),
    "source": pa.array(dcols["source"], pa.string()),
    "n_chars": pa.array(dcols["n_chars"], pa.int64()),
}), f"{out}/documents.parquet")

emb = pq.read_table(f"{SRC}/embeddings.parquet")
dim = len(emb.column("embedding")[0])
vec_ids = emb.column("vec_id").to_pylist()
vecs = emb.column("embedding").to_pylist()
labels = emb.column("label").to_pylist()

# vec_id 19 sits inside the query window (vec_id < 20) and the x42 benchmark
# slice complement — zero it so the degenerate-QUERY paths (x6/x13 NULL-cosine
# windows) are exercised, not just corpus-side drops
q = vec_ids.index(19)
vecs[q] = [0.0] * dim

# vec_id 2 plays every privileged seeding role at once — k-means seed
# (vec_id < 4), IVF centroid (vec_id < 16), query (vec_id < 20), and x51
# old-side (even) seed candidate — zero it to pin the engine's
# degenerate-seeds-cannot-seed doctrine against the oracle's mirror
vecs[vec_ids.index(2)] = [0.0] * dim

# corpus-side degenerates, ids far above the live range so every id-derived
# role (centroid seeds, query windows, benchmark slices: 9001 % 25 != 0, 9002
# and 9003 are odd/even split across x51's increment halves) stays healthy
vec_ids += [9001, 9002, 9003]
vecs += [[0.0] * dim, [], None]
labels += [0, 0, 0]

table = pa.table({
    "vec_id": pa.array(vec_ids, pa.int64()),
    "embedding": pa.array(vecs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
})
pq.write_table(table, f"{out}/embeddings.parquet")
print(f"wrote {out}: embeddings {len(vec_ids)} rows "
      f"(zeroed query vec_id=19; appended 9001 zero / 9002 empty / 9003 NULL)")
