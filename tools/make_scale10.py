#!/usr/bin/env python3
"""Build a 10x-replicated copy of an sf directory for scale testing.

FACT tables (events, documents, embeddings, orders, lineitem) are
replicated 10x with key shifts that keep uniqueness AND referential
consistency (orders.o_orderkey and lineitem.l_orderkey shift together);
DIMENSION tables (region, nation, customer, supplier, part) stay
single-copy — facts grow, dims don't, like a real warehouse scale-up.
Foreign keys into dims (o_custkey, l_suppkey, ...) are left untouched so
join fan-in per dim row grows 10x, which is the interesting case.

Schemas are preserved byte-exact (incl. events.ts INT64 TIMESTAMP(NANOS))
by replicating with pyarrow, not Spark.

Usage: python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/graft_sfx10
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


def main(src, dst, copies=10):
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
            reps.append(r)
        out = pa.concat_tables(reps)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
