#!/usr/bin/env python3
"""Build a degenerate-input test corpus from a driver sf dir.

Copies <src_sf_dir> to <out_dir>, then plants the failure-mode inputs the
engine's cross-engine oracles must survive (each is a class a real feed
produces and the driver's clean synthetic data never exercises):

  - events.value  -> NULL on one row with event_id % 37 != 0 (so the s19
                     corruption rule classifies it "good" on both engines)
  - events.props  -> one row's JSON loses its "k" key (null group keys)
                     and another row's props is NULL outright (null JSON
                     input to from_json/variant/regex extraction)
  - events.event_type -> NULL on one row that KEEPS its value (r11): a
                     null grouping key with real data must survive every
                     groupBy/join — equi-joins on the group key silently
                     drop it (the a18 class) and ORDER BY needs NULLS
                     FIRST pinned
  - documents.text-> NULL for one document (null-text kernels/oracles),
                     "" for another, "   " for a third (zero-token paths
                     and the ANSI 0/0 division guards)
  - documents.lang/source -> NULL on one doc each (null grouping keys —
                     Spark sorts the NULL group first, DuckDB last, so
                     every ORDER BY over them needs NULLS FIRST)
  - embeddings    -> one non-query (vec_id >= 10) vector zeroed
                     (zero-norm cosine guards) and another given one NaN
                     component (DuckDB's NaN>0 = TRUE would smuggle a NaN
                     cos past a bare zero-norm guard; Spark yields NULL)
  - events 'ghost' type (r12) -> three rows retyped to a NEW event_type
                     whose value is ALL NULL: the empty-aggregate group
                     (sum/avg/percentile over zero non-null inputs) in
                     every per-type carrier
  - events all-null-ts user (r12) -> one multi-row user's ts nulled on
                     EVERY row: per-user temporal carriers face a user
                     with zero usable timestamps

Usage:   python3 tools/make_degen.py /root/testdata/sf0.001 /tmp/graft_degen
Gate:    sbt "runMain graft.Verify /tmp/graft_degen /tmp/out_degen"
         python3 tools/check_oracle.py /tmp/out_degen /tmp/graft_degen
Expect:  PASS=<all-with-oracle> FAIL=0 — a FAIL here is a latent
         cross-engine divergence that will surface the day the driver's
         testdata generator ships the same degenerate value.

Round-10 provenance: this gate found tx_fingerprint's NULL-text seed leak
(DuckDB list_prepend(7, NULL) folds to the bare seed) and safeCos's NaN
hole (Spark orders NaN above every numeric, so `NaN >= threshold` passed
every threshold filter) after the inline review had already fixed five
sibling divergences by inspection.

Round-11 provenance: the degenerate plants flushed 53 latent divergences
and 5 outright crashes across five sweeps. Null/empty embeddings (6): all
four Lloyd pipelines NPE'd in the trainer's driver-side seed collect, and
sim_norms' norm-of-NULL diverged. Typed null-ts plants (2): j8's as-of
window null position and a25's frame window, invisible to a type-blind
plant. The three null-key plants (45) across the first three runs: event_type (18): an outright engine crash
(a17's map_from_entries NULL_MAP_KEY), a7's count(*) vs row-sum totals,
d16's pivot-list vs GROUP BY rows, j12's null-unsafe run detection,
s19's concat_ws silently dropping the null field and shifting the CSV
row, p_parse's ELSE branch, twelve orderings. user_id (15): a22's
USING-join dropping Spark's null pseudo-user from the cohort
denominator, p_parse's unparseable 'null'-rendered timestamp, tx_redact's
Java-Formatter-vs-|| null rendering, s16's find-filter vs NOT IN null
semantics, eleven orderings. ts (9): d2's ANSI CANNOT_PARSE_TIMESTAMP
crash on the part-skipped concat, time windows dropping vs emitting the
null window, a22's undated-event cohorting, a24's lag-window null
position reshuffling a whole transition sequence, four orderings.

Deliberately NOT planted: null documents.doc_id / embeddings.vec_id —
those are keyed-entity ids whose contracts are LOUD, not aligned: the
docstore upsert requires non-null keys (a null key is an unidentifiable
document), dedup canonicalization returns min(doc_id) per content group,
and the ANN oracles replay vec_id arithmetic; a feed without ids must be
assigned them at ingest, which is the pipeline's job, not the engine's
null semantics. Also NOT planted: NaN in events.value. That column's contract is
finite-or-NULL (see Tables.events' scaladoc): the engine's parse paths
emit NULL for bad metrics, and a probe run measured the blast radius of
violating it — 14 DuckDB oracles error outright at cast(NaN as decimal),
so the plant would break the harness itself, not reveal engine bugs.
"""
import json
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    src, out = sys.argv[1], sys.argv[2]
    shutil.rmtree(out, ignore_errors=True)
    shutil.copytree(src, out)

    t = pq.read_table(f"{out}/events.parquet")
    d = t.to_pydict()
    n = len(d["event_id"])
    vi = next(i for i in range(n) if d["event_id"][i] % 37 != 0)
    d["value"][vi] = None
    pi = next(i for i in range(n) if i != vi and d["props"][i])
    props = json.loads(d["props"][pi])
    props.pop("k", None)
    d["props"][pi] = json.dumps(props)
    ni = next(i for i in range(n) if i not in (vi, pi) and d["props"][i])
    d["props"][ni] = None
    # a NULL grouping key carrying REAL values: the group must survive
    # every groupBy/join (null-safe keys) with its values aggregated —
    # the r11 review found a18's inner equi-join silently dropping it
    ei = next(i for i in range(n)
              if i not in (vi, pi, ni) and d["value"][i] is not None)
    d["event_type"][ei] = None
    # ... and the same lens on the OTHER grouping key: one unattributed
    # event (null user_id, real type/value) — the logged-out-user row a
    # real feed produces
    ui = next(i for i in range(n)
              if i not in (vi, pi, ni, ei) and d["value"][i] is not None
              and d["event_type"][i] is not None)
    d["user_id"][ui] = None
    # ... and NULL event times (corrupt clock, real everything else):
    # time windows must DROP them (Spark's window() semantics, WHERE ts
    # IS NOT NULL in the oracles), date/hour groupings emit the null
    # group, and every window ORDER BY over ts needs its null position
    # pinned. Planted on a PURCHASE and a CLICK specifically so the
    # temporal-join family (j8/j9/a20/a28 gate on exactly those types)
    # exercises BOTH as-of sides — a type-blind plant can land on a 'view'
    # row that none of those queries ever reads, certifying alignment the
    # gate never tested (r11 review find).
    taken = {vi, pi, ni, ei, ui}
    tis = []
    for want in ("purchase", "click"):
        ti = next(i for i in range(n)
                  if i not in taken and d["value"][i] is not None
                  and d["event_type"][i] == want)
        d["ts"][ti] = None
        taken.add(ti)
        tis.append(ti)
    # r12: an event_type whose values are ALL null — the empty-aggregate
    # group (sum/avg/min/percentile over ZERO non-null inputs) that every
    # per-type carrier must render identically on both engines (the r10
    # a19 advisory class, until now covered only by a unit test). A NEW
    # type name, so no existing type's aggregates shift under the other
    # plants; three rows, so the group is big enough to hit partial
    # aggregation, not just a single-row buffer.
    gis = [i for i in range(n) if i not in taken][:3]
    for i in gis:
        d["event_type"][i] = "ghost"
        d["value"][i] = None
        taken.add(i)
    # r12: a user whose ts is ALL null — per-user temporal carriers
    # (sessionization, funnel, as-of, retention, lag/EWMA windows) face a
    # user contributing rows but ZERO usable timestamps, driver-side.
    # Smallest multi-row user none of whose rows carry another plant.
    rows_by_user = {}
    for i in range(n):
        u = d["user_id"][i]
        if u is not None:
            rows_by_user.setdefault(u, []).append(i)
    tsu = min(u for u, rows in rows_by_user.items()
              if len(rows) >= 2 and not any(r in taken for r in rows))
    for i in rows_by_user[tsu]:
        d["ts"][i] = None
        taken.add(i)
    # r13: docstore-lens plants (the connector's absent⇄null document
    # model, faced driver-side through the degen gate).
    # (a) null key through upsert/erasure: a SECOND unattributed row
    #     (user_id NULL) pinned to the event_id%8==1 slice, so it rides
    #     s15's upsert DELTA — a replacing document whose null field must
    #     write as the store's absent and read back null through
    #     replace-by-key (the upsert KEY itself, event_id, is
    #     contractually non-null and fails loudly; see the not-planted
    #     note above) — AND s16's erasure, where a null-user document
    #     must survive both the IN-list and the range delete_many
    #     untouched (null matches neither predicate).
    ki = next(i for i in range(n)
              if i not in taken and d["event_id"][i] % 8 == 1
              and d["value"][i] is not None and d["event_type"][i] is not None
              and d["ts"][i] is not None and d["user_id"][i] is not None)
    d["user_id"][ki] = None
    taken.add(ki)
    # (b) null clustering column through z-order: a 'view' row loses its
    #     ts, so its hour — the second z-order dimension of s13 — is NULL
    #     at WRITE time: zorderCluster must range-partition the null
    #     z-value into a shard (whose zone map then carries a null-bearing
    #     hr field) and the hr-BETWEEN scan must drop the row identically
    #     on both engines. On a 'view' row so the purchase/click as-of
    #     plants keep their r11 type pinning. (sf0.001's user_id domain is
    #     0-14, so s13's 40-80 box is empty at this SF regardless — the
    #     plant's coverage is the write/prune path, not the result set.)
    zli = next(i for i in range(n)
               if i not in taken and d["event_type"][i] == "view"
               and d["user_id"][i] is not None
               and d["ts"][i] is not None and d["value"][i] is not None)
    d["ts"][zli] = None
    taken.add(zli)
    pq.write_table(pa.table(d, schema=t.schema), f"{out}/events.parquet")
    print(f"events: value=NULL at event_id {d['event_id'][vi]}; "
          f"k-less props at row {pi}; props=NULL at row {ni}; "
          f"event_type=NULL at row {ei} (value {d['value'][ei]}); "
          f"user_id=NULL at row {ui} (event_id {d['event_id'][ui]}); "
          f"ts=NULL at rows {tis} (purchase event_id {d['event_id'][tis[0]]}, "
          f"click event_id {d['event_id'][tis[1]]}); "
          f"all-null-value type 'ghost' at rows {gis}; "
          f"all-null-ts user {tsu} ({len(rows_by_user[tsu])} rows); "
          f"docstore null-key lens: user_id=NULL on upsert-delta row "
          f"(event_id {d['event_id'][ki]} ≡ 1 mod 8, through s15 replace + "
          f"s16 erasure); docstore z-order lens: ts=NULL on view row "
          f"(event_id {d['event_id'][zli]}, user_id {d['user_id'][zli]} — "
          f"null s13 clustering dimension at write)")

    t = pq.read_table(f"{out}/documents.parquet")
    d = t.to_pydict()
    d["text"][3] = None
    d["text"][5] = ""
    d["text"][7] = "   "
    d["lang"][9] = None
    d["source"][11] = None
    # r14: an exact-duplicate TEXT pair at nearby doc_ids. Batch dedup
    # carriers get a real cross-engine dup group, and StreamDegen's
    # cleanCorpusStream parity check gets a dup the stream must actually
    # drop — without this plant the corpus had zero duplicate texts, so
    # the "dedup" half of that gate was vacuously green. The ids must sit
    # CLOSE together: StreamDegen synthesizes event time as 1 min per
    # doc_id against a 30-min watermark delay, and a pair wider than the
    # horizon is one dedupStream's bounded state is DESIGNED to re-emit
    # (that contract is the incremental-dedup family's, not this gate's).
    d["text"][15] = d["text"][13]
    pq.write_table(pa.table(d, schema=t.schema), f"{out}/documents.parquet")
    print(f"documents: text=NULL at doc_id {d['doc_id'][3]}, "
          f"empty at {d['doc_id'][5]}, whitespace at {d['doc_id'][7]}; "
          f"lang=NULL at {d['doc_id'][9]}, source=NULL at {d['doc_id'][11]}; "
          f"exact-dup pair at doc_ids {d['doc_id'][13]}/{d['doc_id'][15]} "
          f"(within StreamDegen's watermark horizon)")

    t = pq.read_table(f"{out}/embeddings.parquet")
    d = t.to_pydict()
    it = (i for i in range(len(d["vec_id"])) if d["vec_id"][i] >= 10)
    zi, ni, li, mi = next(it), next(it), next(it), next(it)
    d["embedding"][zi] = [0.0] * len(d["embedding"][zi])
    d["embedding"][ni] = ([float("nan")] + list(d["embedding"][ni][1:]))
    # ABSENT vectors — the rows a failed embedding job ships: a NULL
    # array and an empty one. The Lloyd pipelines exclude both (r11:
    # a null in the seed window crashed the trainer's driver collect);
    # norms/cosine paths propagate NULL
    d["embedding"][li] = None
    d["embedding"][mi] = []
    pq.write_table(pa.table(d, schema=t.schema), f"{out}/embeddings.parquet")
    print(f"embeddings: zero-norm at vec_id {d['vec_id'][zi]}, "
          f"NaN component at vec_id {d['vec_id'][ni]}, "
          f"NULL at vec_id {d['vec_id'][li]}, empty at vec_id {d['vec_id'][mi]}")


if __name__ == "__main__":
    main()
