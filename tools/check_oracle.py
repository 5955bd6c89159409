#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each <name>/ parquet in verify_out_dir with an entry in
oracle_sql.json: run the oracle SQL in DuckDB over the sf parquet tables,
sort columns by name, compare row count, schema (column names AND
normalized arrow types), and a value hash — approximating the driver's
check so mismatches surface before the round gate does.

Types are compared on the arrow representation of both sides (the oracle
is fetched as arrow, not stringified python): a DuckDB windowed sum
returning HUGEINT (decimal128) against a Spark bigint (int64) is a FAIL
here, as it is at the driver — stringified comparison masked exactly that
drift in round 4 (tx_pack).
"""
import json
import sys
import duckdb
import pyarrow.parquet as pq
import glob
import hashlib
import math

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def type_tag(t):
    """Normalize an arrow type to the distinctions the driver's hash is
    sensitive to — the PYTHON value kind: the driver hashes as_py values,
    where int32/int64 both become `int` (round-4 evidence: 8 queries with
    int32-vs-int64 drift were hash-green at the driver) but a DuckDB
    HUGEINT becomes `Decimal` and fails even when numerically equal.
    """
    import pyarrow as pa
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_tag(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_tag(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{type_tag(t.key_type)},{type_tag(t.item_type)}>"
    if pa.types.is_decimal(t):
        return "decimal"  # as_py -> decimal.Decimal, distinct from int/float
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    return str(t)  # bool, duration, ... keep exact name


def schema_tags(tbl):
    return {f.name: type_tag(f.type) for f in tbl.schema}


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of float64 is exact roundtrip
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def esc(s):
    """Make the '|'-join unambiguous: document text cells can themselves
    contain '|' or newlines, and without escaping two different tables can
    serialize to one byte stream (cell-boundary shift). Deterministic on
    both sides, so genuinely-equal tables still hash equal — this only
    turns false-PASSes into FAILs.
    """
    return s.replace("\\", "\\\\").replace("|", "\\|").replace("\n", "\\n")


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update(("|".join(esc(norm_cell(row[i])) for i in order) + "\n").encode())
    return h.hexdigest()


def main(outdir, sfdir):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    n_pass = n_fail = n_noracle = 0
    seen = set()
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        seen.add(name)
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        if name not in oracle:
            n_noracle += 1
            print(f"{name}: no_oracle (rows={spark_tbl.num_rows})")
            continue
        try:
            otbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        ocols = otbl.column_names
        orows = list(zip(*(otbl.column(c).to_pylist() for c in ocols))) \
            if otbl.num_rows else []
        scols = spark_tbl.column_names
        srows = list(zip(*(spark_tbl.column(c).to_pylist() for c in scols))) \
            if spark_tbl.num_rows else []
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        stags, otags = schema_tags(spark_tbl), schema_tags(otbl)
        type_mismatch = ok_schema and {
            c: (stags[c], otags[c]) for c in scols if stags[c] != otags[c]}
        ok_types = ok_schema and not type_mismatch
        ok_hash = False
        if ok_rows and ok_schema and ok_types:
            ok_hash = table_hash(scols, srows) == table_hash(ocols, orows)
        if ok_rows and ok_schema and ok_types and ok_hash:
            n_pass += 1
            print(f"{name}: OK ({len(srows)} rows)")
        else:
            n_fail += 1
            print(f"{name}: MISMATCH rows={ok_rows}({len(srows)}/{len(orows)}) "
                  f"schema={ok_schema} types={ok_types} hash={ok_hash}")
            if type_mismatch:
                for c, (st, ot) in type_mismatch.items():
                    print(f"   TYPE {c}: spark={st} oracle={ot}")
            if not ok_schema:
                print(f"   spark cols: {sorted(scols)}")
                print(f"   oracle cols: {sorted(ocols)}")
            elif ok_rows and not ok_hash:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                shown = 0
                for i, (sr, orr) in enumerate(zip(srows, orows)):
                    ss = [norm_cell(sr[j]) for j in order_s]
                    oo = [norm_cell(orr[j]) for j in order_o]
                    if ss != oo and shown < 3:
                        print(f"   row {i}: spark={ss}")
                        print(f"   row {i}: oracle={oo}")
                        shown += 1
    # A query that died BEFORE its parquet write never creates its output
    # dir and would otherwise vanish from the totals entirely (the round-1
    # "silently dropped queries" class this tool exists to surface).
    for name in sorted(set(oracle) - seen):
        print(f"{name}: MISSING SPARK OUTPUT DIR (query failed before write?)")
        n_fail += 1
    print(f"\nPASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
