#!/usr/bin/env python3
"""Randomized degenerate-corpus fuzzer (r14).

make_degen.py plants one hand-picked instance of each failure-mode class;
this fuzzer plants the SAME classes at seeded-random rows and densities,
so the cross-engine gate faces the combinations the fixed plants never
produce — several plants landing on one row, nulls clustered inside one
user or type, a HEAVY mode that degenerates half a column, duplicate
texts at arbitrary distances. Every run stays inside the documented
plant contract (make_degen.py's "Deliberately NOT planted" list):

  - no null documents.doc_id / embeddings.vec_id (loud keyed-entity
    contracts, not alignment questions);
  - no NaN/Inf in events.value (finite-or-NULL column contract — the
    DuckDB decimal casts error outright, breaking the harness);
  - events.value nulls only on event_id % 37 != 0 rows (the s19
    corruption rule must classify the row identically on both engines);
  - embedding degenerates (zero / NaN component / NULL / empty) only on
    non-query vectors (vec_id >= 10), as make_degen plants them.

Usage:   python3 tools/fuzz_degen.py <src_sf_dir> <out_dir> <seed>
Gate:    sbt "runMain graft.Verify <out_dir> <dump>"
         python3 tools/check_oracle.py <dump> <out_dir>
Expect:  PASS=<all-with-oracle> FAIL=0 for EVERY seed — a failing seed is
         a reproducible latent divergence (rerun with the same seed).
One-command sweep over seeds 1..N:  bash tools/fuzz_gate.sh [N]
"""
import json
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    src, out, seed = sys.argv[1], sys.argv[2], int(sys.argv[3])
    rng = random.Random(seed)
    shutil.rmtree(out, ignore_errors=True)
    shutil.copytree(src, out)
    summary = []

    def n_plants(n: int) -> int:
        # usually a sprinkle (0.5-5% of rows), occasionally HEAVY (half
        # the column) — the clustered-degeneracy regime the fixed plants
        # never reach
        frac = 0.5 if rng.random() < 0.15 else rng.uniform(0.005, 0.05)
        return max(1, min(n, int(n * frac)))

    # ---- events ----------------------------------------------------------
    t = pq.read_table(f"{out}/events.parquet")
    d = t.to_pydict()
    n = len(d["event_id"])
    idx = list(range(n))

    rows = [i for i in rng.sample(idx, n_plants(n)) if d["event_id"][i] % 37 != 0]
    for i in rows:
        d["value"][i] = None
    summary.append(f"value NULL x{len(rows)}")

    kless = pnull = 0
    for i in rng.sample(idx, n_plants(n)):
        if d["props"][i] is None:
            continue
        if rng.random() < 0.5:
            p = json.loads(d["props"][i])
            p.pop("k", None)
            d["props"][i] = json.dumps(p)
            kless += 1
        else:
            d["props"][i] = None
            pnull += 1
    summary.append(f"props k-less x{kless} NULL x{pnull}")

    for col in ("event_type", "user_id", "ts"):
        rows = rng.sample(idx, n_plants(n))
        for i in rows:
            d[col][i] = None
        summary.append(f"{col} NULL x{len(rows)}")

    # duplicate-TIMESTAMP pairs (r15): cross-row ts ties at arbitrary
    # distances. The r14 fuzzer's biggest wins were unpinned orderings
    # that needed a TIE to surface; natural corpora tie rarely, so plant
    # ties deliberately — any query ordering by ts without a full
    # deterministic tie-break diverges between engines here. Copy sources
    # restricted to rows still holding a real ts; each row used once.
    ts_real = [i for i in idx if d["ts"][i] is not None]
    ts_pairs = 0
    taken_ts = set()
    for _ in range(max(1, n_plants(n) // 4)):
        avail = [i for i in ts_real if i not in taken_ts]
        if len(avail) < 2:
            break
        a, b = rng.sample(avail, 2)
        d["ts"][b] = d["ts"][a]
        taken_ts.update((a, b))
        ts_pairs += 1
    summary.append(f"ts dup pairs x{ts_pairs}")

    pq.write_table(pa.table(d, schema=t.schema), f"{out}/events.parquet")

    # ---- documents -------------------------------------------------------
    t = pq.read_table(f"{out}/documents.parquet")
    d = t.to_pydict()
    n = len(d["doc_id"])
    idx = list(range(n))

    degenerate_texts = [None, "", "   ", "\t\n"]
    rows = rng.sample(idx, n_plants(n))
    for i in rows:
        d["text"][i] = rng.choice(degenerate_texts)
    summary.append(f"text degenerate x{len(rows)}")

    # exact-duplicate pairs at arbitrary distances (batch dedup carriers;
    # the dedup TRUTH is recomputed by the oracle either way). Copy
    # sources are restricted to rows still holding a REAL text (the
    # degenerate pass above may have blanked any row), and each planted
    # row is used at most once — otherwise a pair could just clone a
    # None/"" (no dup group planted) or overwrite an earlier plant, and
    # the summary would overstate what actually landed. The count is
    # taken from the pairs that actually planted, not the attempt budget.
    degenerate_set = set(degenerate_texts)
    real = [i for i in idx if d["text"][i] not in degenerate_set]
    planted_pairs = 0
    budget = max(1, n_plants(n) // 4)
    taken = set()
    for _ in range(budget):
        avail = [i for i in real if i not in taken]
        if len(avail) < 2:
            break
        a, b = rng.sample(avail, 2)
        d["text"][b] = d["text"][a]
        taken.update((a, b))
        planted_pairs += 1
    summary.append(f"dup pairs x{planted_pairs}")

    for col in ("lang", "source"):
        rows = rng.sample(idx, n_plants(n))
        for i in rows:
            d[col][i] = None
        summary.append(f"{col} NULL x{len(rows)}")

    pq.write_table(pa.table(d, schema=t.schema), f"{out}/documents.parquet")

    # ---- embeddings ------------------------------------------------------
    t = pq.read_table(f"{out}/embeddings.parquet")
    d = t.to_pydict()
    n = len(d["vec_id"])
    eligible = [i for i in range(n) if d["vec_id"][i] >= 10]

    modes = ("zero", "nan", "null", "empty")
    rows = rng.sample(eligible, min(len(eligible), n_plants(n)))
    used = {m: 0 for m in modes}
    for i in rows:
        m = rng.choice(modes)
        used[m] += 1
        if m == "zero":
            d["embedding"][i] = [0.0] * len(d["embedding"][i])
        elif m == "nan":
            v = list(d["embedding"][i])
            v[rng.randrange(len(v))] = float("nan")
            d["embedding"][i] = v
        elif m == "null":
            d["embedding"][i] = None
        else:
            d["embedding"][i] = []
    summary.append("embedding " + " ".join(f"{m} x{c}" for m, c in used.items()))

    # duplicate-EMBEDDING pairs (r15): identical vectors create exact
    # distance/similarity TIES in the knn/ann/dedup family — any top-k or
    # pair ranking without a deterministic id tie-break diverges here.
    # Sources restricted to non-query (vec_id >= 10), still-real vectors
    # (not degenerated above); each row used once.
    def real_vec(i):
        v = d["embedding"][i]
        return (v is not None and len(v) > 0 and
                not any(x != x for x in v) and any(x != 0.0 for x in v))
    emb_real = [i for i in eligible if real_vec(i)]
    emb_pairs = 0
    taken_e = set()
    for _ in range(max(1, n_plants(n) // 4)):
        avail = [i for i in emb_real if i not in taken_e]
        if len(avail) < 2:
            break
        a, b = rng.sample(avail, 2)
        d["embedding"][b] = list(d["embedding"][a])
        taken_e.update((a, b))
        emb_pairs += 1
    summary.append(f"embedding dup pairs x{emb_pairs}")

    pq.write_table(pa.table(d, schema=t.schema), f"{out}/embeddings.parquet")
    print(f"fuzz_degen seed={seed}: " + "; ".join(summary))


if __name__ == "__main__":
    main()
