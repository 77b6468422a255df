"""Distributed cardinality sketches.

HyperLogLog (Flajolet et al. 2007) re-expressed as two DataFrame folds:
`hll_registers` produces the SKETCH — a <= 2^p-row register table that is
the mergeable aggregation state (merge = max per register, exactly what
Spark's map-side partial MAX already does) — and `hll_estimate` folds the
registers into the one-row cardinality estimate with the standard
small-range linear-counting correction.

Why it belongs in a web-scale engine: "how many distinct URLs / hosts /
fingerprints" is the planning query behind every dedup tier, and the exact
answer costs a full-key shuffle (count(DISTINCT url) at 10^12 rows shuffles
10^12 urls).  The sketch shuffles AT MOST 2^p integer pairs per map task —
the answer's cost stops depending on the corpus size.  Spark ships
approx_count_distinct (a native HLL++), but its hash and bias tables are
engine-private; this implementation is built on the md5-portable hash64 so
a DuckDB oracle reproduces every register AND the estimate bit-for-bit —
the same portability contract as the minhash/simhash family.

Cross-engine determinism: the register index and rank come from integer
ops on the 56-bit md5 hash (bit length via LENGTH(BIN(x)) — both engines
print minimal binary); the harmonic sum is accumulated EXACTLY as
sum(2^(53-M_j)) in DECIMAL (each term a power of two <= 2^52, so the
per-register double POWER is exact and the decimal sum is exact integer
arithmetic — a float harmonic sum would be partition-order-dependent).
Only the final alpha*m^2/sum division and the linear-counting ln run in
double, as single identical IEEE expressions in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import hash64

_HASH_BITS = 56  # hash64 = first 14 hex chars of md5


def hll_registers(df: DataFrame, col: Column, p: int = 12) -> DataFrame:
    """Register table (bucket, m) for a 2^p-register HLL over `col`:
    bucket = low p bits of the 56-bit portable hash, m = max over the
    bucket's values of rank(remaining bits) where rank = (56-p) - bitlen
    + 1 (the 1-based position of the first set bit, (56-p)+1 when all
    remaining bits are zero).

    This IS the mergeable sketch: union register tables from any number of
    runs/partitions and fold with max(m) per bucket — used the same way
    the fp-store makes exact dedup incremental.  Scale: one narrow map
    (hash + two integer ops) and one <= 2^p-cardinality shuffle with
    map-side partial MAX; output is at most 2^p rows regardless of input
    size."""
    if not 4 <= p <= 24:
        # p <= 3 lets max rank (56-p)+1 exceed 53, turning the estimate's
        # claimed-exact 2^(53-M) decimal terms fractional (and rounding
        # them differently per engine) — fail loudly, not approximately
        raise ValueError(f"hll p must be in [4, 24], got {p}")
    rem_bits = _HASH_BITS - p
    h = hash64(col)
    bucket = F.pmod(h, F.lit(1 << p)).cast("int")
    # integer shift, NOT float division: h has up to 56 significant bits and
    # a double mantissa holds 53 — h/4096.0 would round before truncation
    rem = F.shiftright(h, p)
    rank = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits) - F.length(F.bin(rem)) + 1
    )
    return (
        df.select(bucket.alias("bucket"), rank.cast("int").alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("m"))
    )


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """Fold a register table into one row
    (m_registers, v_zero, sum_scaled, est_distinct).

    sum_scaled = sum over all 2^p registers of 2^(53 - M_j) (absent
    registers count M=0) — the HLL harmonic denominator scaled by 2^53 so
    it is EXACT integer arithmetic in DECIMAL(38,0).  est_distinct applies
    the standard estimator alpha_m * m^2 / sum with the linear-counting
    correction (est <= 2.5m and empty registers present -> m*ln(m/V))."""
    m = 1 << p
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}.0))"
    folded = registers.agg(
        F.count("*").alias("_present"),
        F.sum(F.pow(F.lit(2.0), F.lit(53) - F.col("m")).cast("decimal(20,0)"))
        .cast("decimal(38,0)")
        .alias("_sum_present"),
    )
    two53 = 9007199254740992  # 2^53, exact in double and decimal
    withz = folded.select(
        F.lit(m).alias("m_registers"),
        (F.lit(m) - F.col("_present")).cast("long").alias("v_zero"),
        (
            F.coalesce(F.col("_sum_present"), F.lit(0).cast("decimal(38,0)"))
            + (F.lit(m) - F.col("_present")).cast("decimal(38,0)")
            * F.lit(two53).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("sum_scaled"),
    )
    raw = F.expr(
        f"{alpha} * {m}.0 * {m}.0 * {float(two53)!r}"
        " / CAST(sum_scaled AS DOUBLE)"
    )
    est = F.when(
        (raw <= 2.5 * m) & (F.col("v_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero")),
    ).otherwise(raw)
    return withz.select(
        "m_registers",
        "v_zero",
        "sum_scaled",
        F.floor(est).cast("long").alias("est_distinct"),
    )


def hll_distinct(df: DataFrame, col: Column, p: int = 12) -> DataFrame:
    """One-shot composition: registers -> estimate."""
    return hll_estimate(hll_registers(df, col, p), p)


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): frequency estimation in
# d*w bounded space.  Like the HLL above, the sketch table IS the mergeable
# aggregation state (merge = per-cell SUM), the hashes are md5-portable so
# a DuckDB oracle reproduces every cell and every estimate exactly, and the
# one-sided error guarantee (est >= true; est <= true + eps*N w.h.p.) is
# pinned by a property test.  Use: term/host/url frequency questions over
# 10^12 rows where the exact aggregate's output cardinality (the full
# vocabulary) is itself too large to shuffle or store.


def _cm_cells(col: Column, d: int, w: int):
    """The d (row, bucket) cells a value maps to — ONE definition shared by
    build and probe: if these ever drifted apart, point queries would hash
    to different cells than the sketch and the est >= true guarantee would
    silently break."""
    return F.posexplode(
        F.array(
            *[
                F.pmod(hash64(F.concat(F.lit(f"{i}:"), col)), F.lit(w)).cast(
                    "int"
                )
                for i in range(d)
            ]
        )
    )


def cm_sketch(df: DataFrame, col: Column, d: int = 4, w: int = 1024) -> DataFrame:
    """(row, bucket, cnt) cell table of a d x w Count-Min sketch over
    `col`.  Row i's hash is the portable hash64 of 'i:' || value, mod w —
    d independent-enough hash rows from one md5 per (i, value).

    Scale: one narrow map fanning each value to its d cells (explode of a
    codegen-built d-array), then ONE aggregate shuffle whose output is at
    most d*w rows — map-side partials absorb hot values, so a mega-term
    ships d partial counts per map task, not its occurrences."""
    cells = df.select(_cm_cells(col, d, w).alias("row", "bucket"))
    return cells.groupBy("row", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each probe value: est = MIN over the d
    rows of the probed cell (absent cell = 0).  Returns (item, est_n).
    The sketch is at most d*w rows — it BROADCASTS; the probe set never
    shuffles."""
    item = F.col(probe_col)
    keyed = probes.select(
        item.alias("item"), _cm_cells(item, d, w).alias("row", "bucket")
    )
    return (
        keyed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_n"))
    )
