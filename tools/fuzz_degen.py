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
  - embedding degenerates (zero / NaN component / NULL / empty / inf /
    huge) only on non-query vectors (vec_id >= 10), as make_degen
    plants them;
  - (r16, numeric) |events.value| <= 2e5: a25's integer-cents window
    algebra squares vc = value*100 inside 20-row frames and compares
    9*(n*s2 - s1^2) as a BIGINT on both engines — the documented safe
    domain is |vc| < sqrt(2^63 / 3600) ~= 5e7, i.e. |value| < 5e5, and
    both engines ERROR (not diverge) past it, which breaks the harness
    rather than testing it. The bound itself is pinned by a unit test
    (NumericDomainSpec);
  - (r16, numeric) user_id / event_id extremes are NON-NEGATIVE only:
    the engine intentionally uses pmod() where the oracle uses C-style
    `%` (s9's filter, synthParsed's IP/port synthesis) — id columns are
    non-negative by the table contract, so negative ids are a domain
    violation, not a divergence. event_id extremes stay unique and
    leave 2^31 of headroom below Long.MaxValue (s15's changestream
    shifts ids by +1e7); user_id extremes stay <= 2^59-1 and are capped
    at 8 plants per corpus so any single group's sum stays far from
    bigint overflow on both engines.

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
import unicodedata

import pyarrow as pa
import pyarrow.parquet as pq

# Unicode plant payloads (r16): every corpus before this was pure ASCII,
# so the cross-engine semantics of case folding (Turkish dotted İ, ß→SS,
# Greek final sigma, ligature expansion — FULL mappings in the JVM vs
# per-codepoint simple mappings in utf8proc), combining marks (NFC vs NFD
# spell the same visible text as different strings), and astral-plane
# code points (UTF-16 surrogate pairs vs UTF-8 code points in
# length/substring/levenshtein) were completely unexercised.
UNICODE_PAYLOADS = [
    "İstanbul ısparta Diyarbakır",                 # dotted/dotless i
    "straße STRASSE Maß ß weiß",                   # sharp s (full upper → SS)
    "ΣΙΣΥΦΟΣ σίσυφος τέλος",                       # Greek final sigma
    "ﬁne ﬂow oﬃce aﬀord",                          # ligatures (full casing expands)
    unicodedata.normalize("NFC", "café résumé naïve déjà"),   # composed accents
    unicodedata.normalize("NFD", "café résumé naïve déjà"),   # decomposed twin, same visible text
    "emoji 😀😀 gothic 𐍈𐌰 math 𝕏𝕐 done",           # astral plane (surrogate pairs)
    "mixed ascii 中文 text العربية tail",           # CJK + RTL mixed in
]


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

    # extreme-numeric plants (r16): the domain bounds are derived in the
    # contract notes at the top of this file. value extremes stress the
    # integer-cents quantization (a25/a26), decimal casts, and the
    # CSV/JSON roundtrip fidelity of signed zero and sub-cent epsilons;
    # they may overwrite earlier NULL plants (a non-null value is always
    # in contract).
    # +0.0, never -0.0 (r16 seed 2026081613): Spark normalizes signed
    # zero to +0.0 whenever a double becomes a grouping/join/window key
    # (NormalizeFloatingNumbers), DuckDB passes through whichever
    # representative it grouped first — w7's value-histogram deciles
    # printed 0.0 vs -0.0 for identical groups. The engine's documented
    # ingestion contract (Tables.scala value notes; same family as the
    # docstore's canonKey zero rule) is that writers normalize signed
    # zero, so -0.0 is a domain violation, not a divergence.
    val_ext = [0.0, 199999.99, -199999.99, 0.125, -0.125, 1e-12, 0.005]
    rows = rng.sample(idx, max(2, n_plants(n) // 4))
    for i in rows:
        d["value"][i] = rng.choice(val_ext)
    summary.append(f"value extreme x{len(rows)}")

    # user_id extremes: non-negative, <= 2^59-1, at most 8 per corpus
    # (group-sum safety on both engines); 2^53+1 is the double-exactness
    # trap — it shows the moment either engine routes a bigint through a
    # double.
    uid_ext = [0, 1 << 40, (1 << 53) + 1, (1 << 59) - 1]
    rows = rng.sample(idx, rng.randint(2, 8))
    for i in rows:
        d["user_id"][i] = rng.choice(uid_ext)
    summary.append(f"user_id extreme x{len(rows)}")

    # event_id extremes: unique, huge, 2^31 of headroom below
    # Long.MaxValue (the changestream's +1e7 shift must not overflow),
    # and % 37 != 0 so a prior NULL-value plant on the row stays inside
    # the s19 corruption-rule contract.
    eid_base = (1 << 63) - 1 - (1 << 31)
    eid_ext = [v for v in range(eid_base - 80, eid_base) if v % 37 != 0]
    rows = rng.sample(idx, rng.randint(1, 4))
    for i, v in zip(rows, rng.sample(eid_ext, len(rows))):
        d["event_id"][i] = v
    summary.append(f"event_id extreme x{len(rows)}")

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

    # unicode plants (r16): payloads replace some texts and append to
    # others (a long realistic text carrying a unicode tail exercises the
    # tokenizer/chunker windows, not just whole-string paths)
    uni_rows = rng.sample(idx, max(2, n_plants(n) // 2))
    for i in uni_rows:
        payload = rng.choice(UNICODE_PAYLOADS)
        if rng.random() < 0.5 or d["text"][i] is None:
            d["text"][i] = payload
        else:
            d["text"][i] = d["text"][i] + " " + payload
    summary.append(f"unicode x{len(uni_rows)}")

    # normalization/casing twins: b = NFD(a) or upper(a) — near-identical
    # texts only unicode handling distinguishes (near-dup/fuzzy-match
    # boundary cases). Sources prefer the freshly-planted unicode rows,
    # where NFD and case mapping actually change the string.
    uni_twins = 0
    taken_u = set()
    for _ in range(max(1, n_plants(n) // 8)):
        srcs = [i for i in uni_rows if d["text"][i] and i not in taken_u] or \
               [i for i in idx if d["text"][i] and i not in taken_u]
        dsts = [i for i in idx if d["text"][i] is not None and i not in taken_u]
        if not srcs or len(dsts) < 2:
            break
        a = rng.choice(srcs)
        b = rng.choice([i for i in dsts if i != a])
        d["text"][b] = (unicodedata.normalize("NFD", d["text"][a])
                        if rng.random() < 0.5 else d["text"][a].upper())
        taken_u.update((a, b))
        uni_twins += 1
    summary.append(f"unicode twins x{uni_twins}")

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

    # inf/huge (r16): an ±Inf or near-float32-max component drives dot
    # products and norms to ±Inf/NaN — IEEE doubles agree across engines,
    # but any score floor, tie-break, or NaN filter that treats them
    # asymmetrically diverges here. nullcomp (r16 review): a NULL element
    # inside an otherwise-real vector — Spark's exists() three-values it
    # while DuckDB's list_filter drops it, so the "null component =>
    # degenerate" contract needs the plant to stay enforced.
    modes = ("zero", "nan", "null", "empty", "inf", "huge", "nullcomp")
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
        elif m == "inf":
            v = list(d["embedding"][i])
            v[rng.randrange(len(v))] = float("inf") if rng.random() < 0.5 else float("-inf")
            d["embedding"][i] = v
        elif m == "huge":
            v = list(d["embedding"][i])
            v[rng.randrange(len(v))] = 3e38  # near float32 max; squares to +Inf
            d["embedding"][i] = v
        elif m == "nullcomp":
            v = list(d["embedding"][i])
            v[rng.randrange(len(v))] = None
            d["embedding"][i] = v
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
