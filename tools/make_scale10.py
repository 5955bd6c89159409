#!/usr/bin/env python3
"""Build an Nx-replicated copy of an sf directory for scale testing.

FACT tables (events, documents, embeddings, orders, lineitem) are
replicated Nx with key shifts that keep uniqueness AND referential
consistency (orders.o_orderkey and lineitem.l_orderkey shift together);
DIMENSION tables (region, nation, customer, supplier, part) stay
single-copy — facts grow, dims don't, like a real warehouse scale-up.
Foreign keys into dims (o_custkey, l_suppkey, ...) are left untouched so
join fan-in per dim row grows Nx, which is the interesting case.

Schemas are preserved byte-exact (incl. events.ts physical type) by
replicating with pyarrow, not Spark.

Two optional text-perturbation modes for documents.text, because plain
replication turns every document into N exact copies and every dedup
query's OUTPUT (and truth set) then grows quadratically in N — measuring
the replication artifact, not the operator (documented in SCALE.md):

--tag-docs appends one per-replica token. Texts become distinct (no
  exact dups across replicas) and the language/quality/tokenization
  character of the corpus is preserved — right for gates, BM25, tx_*.
  NOT sufficient for near-dup dedup: one appended token leaves
  cross-replica jaccard ≈0.9 and simhash Hamming ≈0, so all C(N,2)
  cross-replica pairs are TRUE near-dups and near-dup truth sets still
  grow quadratically (measured: dd_simhash 65 s at x10 --tag-docs vs
  1.4 s at x1).

--prefix-docs prefixes EVERY token with the replica tag. Replicas share
  zero shingles/tokens, so the corpus behaves as N disjoint corpora with
  the base's dup structure each — near-dup density constant, dedup truth
  sets and work scale LINEARLY: the real-world "more data, same dup
  rate" model, right for the dd_* family. Trade-off: tokens stop being
  English (stopword/lang gates fail everything), so do NOT use it for
  gate/IR queries.

Usage: python3 tools/make_scale10.py SRC DST [copies] [--tag-docs|--prefix-docs]
  e.g. python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/graft_sfx10
       python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/graft_sfx100t 100 --tag-docs
       python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/graft_sfx100p 100 --prefix-docs
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 10_000_000_000  # far above any base key

# table -> columns to shift per replica (keys that must stay unique/consistent)
FACTS = {
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main(src, dst, copies=10, tag_docs=False, prefix_docs=False):
    import os
    os.makedirs(dst, exist_ok=True)
    for name in DIMS:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: dim, {t.num_rows} rows (single copy)")
    for name, keys in FACTS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        reps = []
        for i in range(copies):
            r = t
            for k in keys:
                shifted = pc.add(r.column(k), pa.scalar(i * SHIFT, type=r.schema.field(k).type))
                r = r.set_column(r.schema.get_field_index(k), r.schema.field(k), shifted)
            if tag_docs and name == "documents":
                idx = r.schema.get_field_index("text")
                tagged = pc.binary_join_element_wise(
                    r.column("text").cast(pa.string()),
                    pa.scalar(f"rep{i}"), pa.scalar(" "))
                r = r.set_column(idx, r.schema.field("text"), tagged.cast(r.schema.field("text").type))
            if prefix_docs and name == "documents":
                idx = r.schema.get_field_index("text")
                # r<i><token> for every token: replicas share zero tokens
                pref = f"r{i}"
                txt = r.column("text").cast(pa.string())
                prefixed = pc.binary_join_element_wise(
                    pa.scalar(pref),
                    pc.replace_substring(txt, " ", f" {pref}"), pa.scalar(""))
                r = r.set_column(idx, r.schema.field("text"), prefixed.cast(r.schema.field("text").type))
            reps.append(r)
        out = pa.concat_tables(reps)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    copies = int(args[2]) if len(args) > 2 else 10
    main(args[0], args[1], copies, tag_docs="--tag-docs" in sys.argv,
         prefix_docs="--prefix-docs" in sys.argv)
