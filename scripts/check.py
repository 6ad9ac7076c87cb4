#!/usr/bin/env python3
"""Local (dev-only) oracle pre-check emulating the driver's DuckDB compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Registers each testdata parquet as a DuckDB view under its bare table
name, runs every SQL in <verifyOutDir>/oracle_sql.json, and compares the
result with the Spark-written parquet at <verifyOutDir>/<name>/ —
columns sorted by name, row order as produced (queries must ORDER BY).
NOT part of the shipped library; the driver owns the real gate.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_gate(con, name, sql):
    """Fail fast on oracle output types the driver's hash is sensitive to.

    canon() below coerces every integer dtype to int64 before comparing,
    which masked the round-6 HUGEINT bug: DuckDB types an uncast
    SUM(BIGINT) as HUGEINT (int128) while Spark emits BIGINT, so the
    driver's type-sensitive hash diverged although values matched. Any
    HUGEINT/UHUGEINT output column is therefore an oracle bug by
    construction — the fix is CAST(... AS BIGINT) in the oracle SQL.
    Returns a list of (column, duckdb_type) offenders.
    """
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    return [(col, typ) for col, typ, *_ in desc
            if "HUGEINT" in typ.upper()]


def dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class the driver's hash distinguishes.

    Round-13 shipped two keys where Spark emitted DOUBLE for a value the
    oracle typed BIGINT (percentile_disc); canon()'s int64/float64
    coercion plus pandas' cross-type `==` made that invisible locally
    while the driver's type-sensitive hash failed it. Compare KINDS on
    the RAW frames before any coercion. Decimal-object columns count as
    float (both engines surface decimals as exact numerics; the engines
    agree there and pandas representation differs by reader, not type).
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if s.dtype == object:
        import decimal
        import datetime
        nn = s.dropna()
        if len(nn) and all(isinstance(v, decimal.Decimal) for v in nn.head(5)):
            return "float"
        # pyarrow surfaces Spark DATE columns as object-of-date while
        # duckdb fetchdf gives datetime64 — same engine type (DATE on
        # both sides, 13 rounds of green driver hashes), reader-only
        # representation difference.
        if len(nn) and all(isinstance(v, datetime.date) for v in nn.head(5)):
            return "datetime"
    return "object"


def kind_gate(exp: pd.DataFrame, got: pd.DataFrame):
    """(col, oracle_kind, spark_kind) for every column whose raw dtype
    kind differs — run BEFORE canon() so int-vs-float skew is visible."""
    bad = []
    for c in sorted(set(exp.columns) & set(got.columns)):
        # An all-null object column carries no kind evidence (e.g. a
        # DATE column with zero matches at this SF reads back as
        # object-of-None); the value compare still covers it.
        if ((exp[c].dtype == object and exp[c].notna().sum() == 0) or
                (got[c].dtype == object and got[c].notna().sum() == 0)):
            continue
        ek, gk = dtype_kind(exp[c]), dtype_kind(got[c])
        # NULLs float-ify integer columns in both readers; a float side
        # whose values are all integral against an int side with NaNs is
        # reader coercion, not engine skew — but only excuse it when the
        # column actually contains NULLs.
        if ek != gk:
            pair = {ek, gk}
            if pair == {"int", "float"}:
                fs = exp[c] if ek == "float" else got[c]
                if fs.isna().any():
                    fv = fs.dropna()
                    if (fv == fv.round()).all():
                        continue
            bad.append((c, ek, gk))
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            offenders = type_gate(con, name, sql)
            if offenders:
                print(f"FAIL {name}: HUGEINT oracle columns {offenders} "
                      f"(driver hash-diverges; CAST to BIGINT in the oracle)")
                n_fail += 1
                continue
            exp_raw = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {outdir}/{name}")
            n_fail += 1
            continue
        got_raw = pd.read_parquet(f"{outdir}/{name}")
        kinds = kind_gate(exp_raw, got_raw)
        if kinds:
            print(f"FAIL {name}: dtype-kind skew {kinds} "
                  f"(driver hash is type-sensitive; CAST one side)")
            n_fail += 1
            continue
        exp = canon(exp_raw)
        got = canon(got_raw)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if exp.shape != got.shape:
            print(f"FAIL {name}: shape exp={exp.shape} got={got.shape}")
            n_fail += 1
            continue
        bad = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            if pd.api.types.is_float_dtype(e):
                ok = ((e.isna() & g.isna()) | (e == g) |
                      (np.isclose(e, g, rtol=0, atol=1e-9, equal_nan=True))).all()
            else:
                ok = ((e.isna() & g.isna()) | (e.astype(str) == g.astype(str))).all() \
                    if e.isna().any() or g.isna().any() else (e == g).all()
            if not ok:
                mism = (~((e.isna() & g.isna()) | (e == g))).idxmax() if len(e) else -1
                bad.append((c, mism, e.iloc[mism] if mism >= 0 else None,
                            g.iloc[mism] if mism >= 0 else None))
        if bad:
            print(f"FAIL {name}: value mismatch {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({exp.shape[0]} rows, {exp.shape[1]} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
