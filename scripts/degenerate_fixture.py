#!/usr/bin/env python3
"""Build a degenerate-embeddings fixture: copy an sf dir and append one
all-zero and one NULL embedding row (ids max+1, max+2) to embeddings.

The similarity/embed queries claim cross-engine determinism on degenerate
vectors (zero-norm/NULL -> sentinel cosine -1.0, NULL canonicalized to the
zero vector — see Similarity.scala's CosSim). This fixture makes that
claim checkable end-to-end against the DuckDB oracle:

    python3 scripts/degenerate_fixture.py /root/testdata/sf0.001 /tmp/degen
    sbt "runMain graft.Verify /tmp/degen /tmp/degen_out \
q_simsearch,q_simsearch_lsh,q_simsearch_banded,q_simsearch_ivf,\
q_rag_retrieve,q_embed_centroid,q_embed_outliers,q_embed_assign,q_embed_dedup"
    python3 scripts/check_oracle.py /tmp/degen /tmp/degen_out
    # expect: 9/9 oracle-checked queries pass

(Driver-side tooling only — the shipped Scala library does not depend on it.)
"""
import glob
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_degen_fixture"

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
for f in glob.glob(f"{src}/*.parquet"):
    if os.path.basename(f) != "embeddings.parquet":
        shutil.copy(f, dst)

t = pq.read_table(f"{src}/embeddings.parquet")
maxid = max(t.column("vec_id").to_pylist())
lab0 = t.column("label")[0].as_py()
dim = len(t.column("embedding")[0].as_py())
# build the appended rows against the SOURCE schema (pa.concat_tables
# requires exact equality; hardcoded widths would abort on e.g. an
# int32 vec_id), and carry any extra columns through as NULLs
values = {"vec_id": [maxid + 1, maxid + 2],
          "embedding": [[0.0] * dim, None],
          "label": [lab0, lab0]}
extra = pa.table({f.name: pa.array(values.get(f.name, [None, None]),
                                   f.type) for f in t.schema})
merged = pa.concat_tables([t, extra])
pq.write_table(merged, f"{dst}/embeddings.parquet")
print(f"wrote {dst}/embeddings.parquet: {merged.num_rows} rows "
      f"(zero-norm id {maxid + 1}, NULL id {maxid + 2})")
