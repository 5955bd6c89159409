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

Two more perturbation modes (r14), killing the remaining two clone
artifacts the same way --prefix-docs killed the text one:

--jitter-ts shifts every events.ts in replica i by a deterministic
  per-replica stride of (base span + 7h) * i. Plain replication puts N
  clones of every event at the IDENTICAL timestamp, so any time-window
  self-join's TRUE output (st4_interval_join's 6h error->click window)
  contains every cross-replica clone pair — N^2 growth that measures the
  generator, not the operator. A small WITHIN-window jitter cannot fix
  this (cross-replica pairs would still fall in the window, merely a
  different slice of them); the realistic 10x model is "same event rate,
  10x the collection period", which is exactly what a super-window stride
  produces: replicas become temporally disjoint (the 7h slack exceeds the
  6h join window, so the minimum cross-replica gap is > 6h), within-
  replica structure is byte-preserved, output and truth scale LINEARLY.
  Do not use for queries that aggregate by absolute date (the calendar
  span grows Nx by construction — that IS the model).

--perturb-embeddings applies a deterministic per-replica ORTHOGONAL
  ROTATION to embeddings.embedding AND shifts embeddings.label per
  replica (replica 0 keeps the base bytes).
  Plain replication gives every vector N-1 exact clones at cosine 1.0,
  so sim_near_dup's truth set (cosine >= 0.45 within label) grows
  quadratically. Literal epsilon noise CANNOT fix this: adding
  independent noise of relative magnitude a to clones leaves their
  cosine at ~1/(1+a^2), so pushing clones below the 0.45 threshold
  needs a ~ 1.1 — noise as large as the signal, which also rescales
  every within-replica cosine c to ~c/(1+a^2) and destroys the base
  truth set. A rotation is the construction with both properties at
  once: within-replica cosines and norms are EXACTLY preserved (up to
  float32 rounding), while cross-replica cosines of generically rotated
  copies concentrate at 0 +- 1/sqrt(d) — far below any near-dup
  threshold. One tail remains: with ~N^2/2 * blocks cross-replica pairs
  compared, even a 0 +- 1/sqrt(64) cosine distribution leaves a few
  3.6-sigma outliers above 0.45 (measured: 9 surviving cross pairs at
  x3 on sf0.01) — a quadratically-growing term with a tiny constant.
  The label shift closes it: label-blocked queries (sim_near_dup's
  a.label = b.label) never COMPARE cross-replica pairs, which is the
  real-world scale model anyway — more data means more categories of
  the same size, not one category N times deeper. Rotation still
  carries the unblocked queries (knn, LSH, k-means, semantic dedup),
  where exact clones at cosine 1.0 are the artifact being killed.
  Together: the embedding analogue of --prefix-docs — N disjoint
  corpora, each with the base's dup structure, density constant, truth
  LINEAR.

--hot-user=F reassigns a deterministic fraction F (e.g. 0.3) of every
  events replica's rows to user_id 0 — the seeded hot-key corpus for the
  skew story (SURVEY: "attacker IPs dominate groupBy(ip)"). Selection is
  event_id % 100 < F*100, so it is replica-stable and reproducible; the
  hot user then owns ~F of all events at any replication factor, which
  is the adversarial shape joins/windows keyed on user_id must survive.

Usage: python3 tools/make_scale10.py SRC DST [copies] [--tag-docs|--prefix-docs] [--jitter-ts] [--perturb-embeddings] [--hot-user=F]
  e.g. python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/graft_sfx10
       python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/graft_sfx100t 100 --tag-docs
       python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/graft_sfx100p 100 --prefix-docs
       python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/graft_sfx10j 10 --jitter-ts
       python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/graft_sfx10e 10 --perturb-embeddings
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


def _ts_stride(col):
    """Per-replica stride for --jitter-ts, in the ts column's own unit:
    base span + 7h (> the widest self-join window in the registry, st4's
    6h), so replicas are temporally disjoint for any windowed self-join
    while the physical type is preserved byte-exact."""
    typ = col.type
    if not pa.types.is_timestamp(typ):
        raise SystemExit(f"--jitter-ts: events.ts is {typ}, expected a "
                         "timestamp type (driver testdata flipped encoding?)")
    per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[typ.unit]
    mm = pc.min_max(col)
    span = mm["max"].cast(pa.int64()).as_py() - mm["min"].cast(pa.int64()).as_py()
    return span + 7 * 3600 * per_sec


def _rotation(dim, rep):
    """Deterministic orthogonal matrix for replica `rep` (identity for 0):
    QR of a seeded gaussian, sign-fixed so the factorization is unique."""
    import numpy as np
    if rep == 0:
        return np.eye(dim)
    rng = np.random.default_rng(941400 + rep)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return q * np.sign(np.diag(r))


def _rotate_embeddings(r, rep):
    import numpy as np
    idx = r.schema.get_field_index("embedding")
    col = r.column("embedding").combine_chunks()
    rows = col.to_pylist()
    dims = {len(v) for v in rows if v}
    if not dims:
        return r  # all null/empty (degen-style corpus): nothing to rotate
    if len(dims) != 1:
        raise SystemExit(f"--perturb-embeddings: mixed embedding dims {dims}")
    dim = dims.pop()
    qm = _rotation(dim, rep)
    out = [None if v is None else ([] if len(v) == 0 else
           (np.asarray(v, dtype=np.float64) @ qm).astype(np.float32).tolist())
           for v in rows]
    arr = pa.array(out, type=r.schema.field(idx).type)
    return r.set_column(idx, r.schema.field(idx), arr)


def main(src, dst, copies=10, tag_docs=False, prefix_docs=False,
         jitter_ts=False, perturb_embeddings=False, hot_user=0.0):
    import os
    os.makedirs(dst, exist_ok=True)
    for name in DIMS:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: dim, {t.num_rows} rows (single copy)")
    for name, keys in FACTS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        stride = _ts_stride(t.column("ts")) if jitter_ts and name == "events" else 0
        reps = []
        for i in range(copies):
            r = t
            for k in keys:
                shifted = pc.add(r.column(k), pa.scalar(i * SHIFT, type=r.schema.field(k).type))
                r = r.set_column(r.schema.get_field_index(k), r.schema.field(k), shifted)
            if stride and i > 0:
                idx = r.schema.get_field_index("ts")
                typ = r.schema.field(idx).type
                moved = pc.add(r.column("ts").cast(pa.int64()),
                               pa.scalar(i * stride, type=pa.int64())).cast(typ)
                r = r.set_column(idx, r.schema.field(idx), moved)
            if hot_user > 0 and name == "events":
                ui = r.schema.get_field_index("user_id")
                utyp = r.schema.field(ui).type
                eid = t.column("event_id")
                rem = pc.subtract(eid, pc.multiply(
                    pc.divide(eid, pa.scalar(100, type=pa.int64())),
                    pa.scalar(100, type=pa.int64())))
                hot = pc.less(rem, pa.scalar(int(round(hot_user * 100)), type=pa.int64()))
                skewed = pc.if_else(hot, pa.scalar(0, type=utyp), r.column("user_id"))
                r = r.set_column(ui, r.schema.field(ui), skewed)
            if perturb_embeddings and name == "embeddings" and i > 0:
                r = _rotate_embeddings(r, i)
                li = r.schema.get_field_index("label")
                ltyp = r.schema.field(li).type
                shifted_l = pc.add(r.column("label"),
                                   pa.scalar(i * 1_000_000, type=ltyp))
                r = r.set_column(li, r.schema.field(li), shifted_l)
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
        # the hot-user corpus exists to measure AQE's skew-join split, and
        # that mechanism cuts a skewed reduce partition along MAP-OUTPUT
        # boundaries: a single-row-group file scans as one mapper and the
        # hot partition becomes one indivisible chunk AQE cannot split — a
        # test-scale artifact (100 TB inputs have thousands of row groups/
        # mappers), so give this corpus production-like granularity
        kwargs = {"row_group_size": 65536} if hot_user > 0 else {}
        pq.write_table(out, f"{dst}/{name}.parquet", **kwargs)
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    copies = int(args[2]) if len(args) > 2 else 10
    hot = next((float(a.split("=", 1)[1]) for a in sys.argv
                if a.startswith("--hot-user=")), 0.0)
    main(args[0], args[1], copies, tag_docs="--tag-docs" in sys.argv,
         prefix_docs="--prefix-docs" in sys.argv,
         jitter_ts="--jitter-ts" in sys.argv,
         perturb_embeddings="--perturb-embeddings" in sys.argv,
         hot_user=hot)
