"""Registry section: signal kernels, the custom-collector (UDAF) surface,
the Charsequence scalar-function medley, the distribution profile, and the
codepoint-sequence source — closing out the SURVEY §2 inventory."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from semantic_cpp_spark.functions import strings
from semantic_cpp_spark.indexing import IDX, with_ordinal
from semantic_cpp_spark.operators import collectors, signal
from semantic_cpp_spark.registry import EV, _events_stream, register
from semantic_cpp_spark.session import load_table, ts_micros

# -- signal kernels (reference collector.h:2744-2942) -----------------------

@register(
    "sig_dft64",
    f"""WITH {EV},
    x AS (SELECT idx, value FROM ev WHERE idx < 64),
    ks AS (SELECT unnest(range(0, 64)) AS k)
    SELECT k,
           round(sum(value * cos(2 * pi() * k * idx / 64.0)), 4) + 0 AS re,
           round(-sum(value * sin(2 * pi() * k * idx / 64.0)), 4) + 0 AS im
    FROM x, ks GROUP BY k""",
)
def sig_dft64(spark, sf_dir):
    """useDFT over a 64-sample signal (collector.h:2744-2779); oracle is
    the naive trig-sum DFT — numpy.fft agrees to ~1e-12, rounded to 4dp."""
    s = _events_stream(spark, sf_dir).limit(64)
    out = signal.dft(s.to_df(), F.col("value"))
    return out.select("k", (F.round("re", 4) + 0.0).alias("re"), (F.round("im", 4) + 0.0).alias("im"))


@register(
    "sig_fft100_pad_truncate",
    f"""WITH {EV},
    x AS (SELECT idx, value FROM ev WHERE idx < 100),
    ks AS (SELECT unnest(range(0, 100)) AS k)
    SELECT k,
           round(sum(value * cos(2 * pi() * k * idx / 128.0)), 4) + 0 AS re,
           round(-sum(value * sin(2 * pi() * k * idx / 128.0)), 4) + 0 AS im
    FROM x, ks GROUP BY k""",
)
def sig_fft100(spark, sf_dir):
    """useFFT pad/truncate quirk (collector.h:2840-2876): N=100 pads to
    128 — the oracle's denominator is the PADDED length, so matching
    proves the quirk is reproduced (truncated-FFT ≠ DFT here)."""
    s = _events_stream(spark, sf_dir).limit(100)
    out = signal.fft(s.to_df(), F.col("value"))
    return out.select("k", (F.round("re", 4) + 0.0).alias("re"), (F.round("im", 4) + 0.0).alias("im"))


@register(
    "sig_fft_by_window",
    f"""WITH {EV},
    x AS (SELECT idx, value, (idx // 64) * 64 AS win_start, idx % 64 AS i
          FROM ev WHERE idx < 256),
    ks AS (SELECT unnest(range(0, 64)) AS k)
    SELECT x.win_start, k,
           round(sum(value * cos(2 * pi() * k * i / 64.0)), 4) + 0 AS re,
           round(-sum(value * sin(2 * pi() * k * i / 64.0)), 4) + 0 AS im
    FROM x, ks GROUP BY x.win_start, k""",
)
def sig_fft_window(spark, sf_dir):
    """Per-tumbling-window FFT — the scalable form (window groups fan out
    across executors); 4 full 64-sample windows, so pad == size."""
    s = _events_stream(spark, sf_dir).limit(256)
    out = signal.fft_by_window(s.to_df(), F.col("value"), 64)
    return out.select(
        "win_start", "k", (F.round("re", 4) + 0.0).alias("re"), (F.round("im", 4) + 0.0).alias("im")
    )


# -- custom collector / UDAF surface (reference collector.h:476-486) --------

@register(
    "udaf_weighted_avg",
    """WITH s AS (
         SELECT l_returnflag,
                sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS sxw,
                sum(CAST(l_quantity AS BIGINT)) AS sw
         FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag,
              CAST((sxw // sw) * 10000
                   + ((sxw % sw) * 10000 + sw // 2) // sw AS BIGINT)
                / 1000000.0 AS weighted_avg_price
       FROM s""",
)
def udaf_weighted_avg(spark, sf_dir):
    """useCollect with an ALGEBRAIC collector (collector.h:476-486): the
    engine maps identity/accumulate/combine onto built-in partial+final
    aggregates (Σxw, Σw partial-aggregate map-side; one tiny shuffle on
    the 3-value key) and the finisher onto a projection. This is the
    scalable shape for low-cardinality keys — routing the whole table
    through grouped pandas frames would materialise ~⅓ of lineitem per
    task. nullif guards the all-zero-weight group (NULL, as the reference
    collector's finisher would divide-by-zero).

    DECIMAL-EXACT accumulation AND rounding (r6 sf1.0 findings): float
    Σ(price·qty) differs between Spark's and DuckDB's summation ORDERS in
    the last ulp, and even with exact integer sums, rounding the float
    quotient to 6dp diverges on exact half-way ties (Spark's round goes
    through BigDecimal.valueOf's shortest-string HALF_UP; DuckDB rounds
    the exact binary value). Both killed at once: sum exact int64 cents
    (order-independent), then derive the 6 decimal digits with PURE
    INTEGER arithmetic — micros = (s div w)·10⁴ + ((s mod w)·10⁴ +
    w div 2) div w — the identical formula on both engines, so ties
    cannot exist. Intermediates stay < 2⁵³·: s ≤ rows·5·10⁸, and the
    remainder term is < w·10⁴. Final value = micros/10⁶ (one exact-int
    double division on each side)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.sum(cents * qty).alias("sxw"), F.sum(qty).alias("sw")
    )
    micros = F.expr(
        "(sxw div sw) * 10000 + ((sxw % sw) * 10000 + sw div 2) div sw"
    )
    return s.select(
        "l_returnflag", (micros / 1000000.0).alias("weighted_avg_price")
    )


@register(
    "udaf_per_order_weighted_avg",
    """WITH s AS (
         SELECT l_orderkey,
                sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS sxw,
                sum(CAST(l_quantity AS BIGINT)) AS sw,
                count(*) AS n_lines
         FROM lineitem WHERE l_orderkey % 10 = 0
         GROUP BY l_orderkey HAVING count(*) >= 4)
       SELECT l_orderkey,
              CAST((sxw // sw) * 10000
                   + ((sxw % sw) * 10000 + sw // 2) // sw AS BIGINT)
                / 1000000.0 AS weighted_avg_price,
              n_lines
       FROM s""",
)
def udaf_per_order_weighted_avg(spark, sf_dir):
    """useCollect as a grouped pandas UDAF (collector.h:476-486) on a
    HIGH-cardinality key: one order = one pandas frame of ~4 rows, so
    frames stay tiny at every SF and the groups fan out across all
    executors — the scale-correct home for a non-algebraic Python
    finisher. Per-group state = (Σxw, Σw) accumulate → finish by guarded
    division, exactly the reference's collector stages, Arrow-batched.

    Accumulates in EXACT int64 cents and derives the 6dp digits with the
    same pure-integer micros formula as udaf_weighted_avg (r6 sf1.0
    findings: float summation-order drift AND half-way-tie rounding
    divergence both flip 6dp boundaries once group counts reach 10×)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        # deterministic 10% order slice: the gate exercises the identical
        # plan shape at a tenth of the per-group Python invocations
        .filter(F.col("l_orderkey") % 10 == 0)
    )

    # r15 optimization (guide §2.3/§4.1): the original shape invoked
    # applyInPandas once per ORDER — one Python call + one pandas frame
    # per ~4-row group, and every lineitem row crossed the JVM→Python
    # boundary (measured 36.8 s at sf0.1, the single most expensive gate
    # in the registry sweep). The collector's ACCUMULATE stage
    # (Σ cents·qty, Σ qty, count) is algebraic, so Spark's partial
    # map-side aggregation does it without shipping rows to Python; only
    # the non-trivial FINISHER (guarded pure-integer micros division)
    # stays a Python collector stage — mapInPandas over the per-order
    # aggregate rows, whole Arrow batches per call instead of one call
    # per group. Value-identical: same exact-int64 accumulation, same
    # integer micros formula, same sw==0 guard (→ NULL), and the cents
    # rounding moves from numpy round-half-even to Spark's round
    # (HALF_UP) — the two agree on every representable price·100 that is
    # not an exact half, and the sibling udaf_weighted_avg gate pins
    # Spark-round == DuckDB-round on this data. Measured 36.8 s → see
    # OPTIMIZATION_r15.md.
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.col("l_quantity").cast("long")
    s = li.groupBy("l_orderkey").agg(
        F.sum(cents * qty).alias("sxw"),
        F.sum(qty).alias("sw"),
        F.count(F.lit(1)).alias("n_lines"),
    )

    def finisher(batches):
        # useCollect finisher (collector.h:476-486), Arrow-batched: the
        # per-group state (sxw, sw) arrives pre-accumulated; Python only
        # runs the guarded integer division per batch.
        for pdf in batches:
            sxw = pdf["sxw"].astype("int64")
            sw = pdf["sw"].astype("int64")
            safe = sw.replace(0, 1)
            micros = (sxw // safe) * 10000 + (
                (sxw % safe) * 10000 + safe // 2
            ) // safe
            wav = (micros / 1e6).where(sw != 0, None)
            yield pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "weighted_avg_price": wav,
                    "n_lines": pdf["n_lines"],
                }
            )

    # n_lines comes from the built-in aggregate, so the HAVING-style
    # filter runs BEFORE the Python boundary — fewer rows cross, and no
    # risk of the §4.4 double-eval the old plan exhibited (its
    # FlatMapGroupsInPandas appeared TWICE: once below the pushed
    # n_lines filter, once above to produce the output columns).
    out = s.filter(F.col("n_lines") >= 4).mapInPandas(
        finisher, schema="l_orderkey long, weighted_avg_price double, n_lines long"
    )
    return out.select("l_orderkey", "weighted_avg_price", "n_lines")


@register(
    "reduce_bit_xor",
    """SELECT bit_xor(('0x' || substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 15))::BIGINT)
                AS xor_fp
       FROM documents""",
)
def reduce_bit_xor(spark, sf_dir):
    """useReduce with an associative op (collector.h:2337-2375) — engine
    maps associative folds onto built-in partial+final aggregates (here
    bit_xor over document fingerprints)."""
    from semantic_cpp_spark.pipeline.text import fingerprint64

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(fingerprint64(F.col("text")).alias("fp64")).agg(
        F.expr("bit_xor(fp64)").alias("xor_fp")
    )


# -- distribution collector (reference collector.h:1908-2096) ---------------

@register(
    "agg_distribution_profile",
    f"""WITH {EV},
    pv AS (SELECT event_type AS value, sum(idx)::DOUBLE AS pos_sum,
                  count(*)::DOUBLE AS cnt
           FROM ev GROUP BY event_type),
    st AS (SELECT stddev_pop(pos_sum) AS pos_sd, stddev_pop(cnt) AS cnt_sd FROM pv),
    pm AS (SELECT pos_sum AS pos_mode FROM
             (SELECT pos_sum, count(*) AS c FROM pv GROUP BY pos_sum)
           ORDER BY c DESC, pos_sum ASC LIMIT 1),
    cm AS (SELECT cnt AS cnt_mode FROM
             (SELECT cnt, count(*) AS c FROM pv GROUP BY cnt)
           ORDER BY c DESC, cnt ASC LIMIT 1)
    SELECT value,
           round((pos_sum - pos_mode)
                 / (CASE WHEN pos_sd < 0.001 THEN 1.0 ELSE pos_sd END), 6) AS pos_score,
           round((cnt - cnt_mode)
                 / (CASE WHEN cnt_sd < 0.001 THEN 1.0 ELSE cnt_sd END), 6) AS cnt_score
    FROM pv, st, pm, cm""",
)
def agg_distribution(spark, sf_dir):
    """useDistribution: per-value (positionSum, count) z-scored against the
    cross-value MODE with the 0.001→1.0 stddev guard (collector.h:
    1908-2096, guards :1989-1992); deterministic mode tie-break."""
    ev = load_table(spark, sf_dir, "events")
    idxed = with_ordinal(ev, ["event_id"]).select(IDX, "event_type")
    prof = collectors.distribution_profile(idxed, F.col("event_type"))
    return prof.select(
        "value",
        F.round("pos_score", 6).alias("pos_score"),
        F.round("cnt_score", 6).alias("cnt_score"),
    )


# -- Charsequence scalar medley (reference charsequence.h, SURVEY §2.7) -----

def str_medley(spark, sf_dir):
    """Charsequence scalar surface in one projection: ASCII-only case map
    (charsequence.h:1120-1158), 0-based indexOf with -1 absent (:900-938),
    non-overlapping count (:1078-1103), literal replace (:989-1076) incl.
    the maxCount overload (:1029-1076), reverse (:1160-1170), clamped sub
    (:786-810), startsWith/contains (:844-898), lastIndexOf incl. the
    from-offset overload (:940-987), three-way compare (:1220-1249)."""
    p = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        strings.upper_ascii(name).alias("up"),
        strings.index_of(name, "a").cast("long").alias("pos_a"),
        strings.count_occurrences(name, "a").alias("n_a"),
        strings.replace_literal(name, " ", "_").alias("snake"),
        strings.replace_literal(name, " ", "_", 2).alias("snake2"),
        strings.reverse_str(name).alias("rev"),
        strings.sub_clamped(name, 2, 8).alias("mid"),
        strings.starts_with(name, "b").alias("starts_b"),
        strings.contains(name, "ol").alias("has_ol"),
        strings.last_index_of(name, "ol").cast("long").alias("last_ol"),
        strings.last_index_of(name, "a", 5).cast("long").alias("last_a_from5"),
        strings.compare_cs(name, F.lit("forest")).cast("long").alias("cmp_forest"),
    )


def str_codepoints(spark, sf_dir):
    """useSequence: a string as a stream of code points
    (reference semantic.h:2260-2345) — posexplode over the codepoint
    split, with the numeric code point per element."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 20)
    exploded = p.select(
        "p_partkey", F.posexplode(F.split(F.col("p_name"), "")).alias("pos", "ch")
    )
    return exploded.select(
        "p_partkey",
        F.col("pos").cast("long").alias("pos"),
        "ch",
        F.ascii("ch").cast("long").alias("cp"),
    )


# -- semi-structured columns (Spark-native extension) -----------------------

@register(
    "evt_json_extract",
    """SELECT event_type,
              sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
              count(*) AS n
       FROM events GROUP BY event_type""",
)
def evt_json_extract(spark, sf_dir):
    """JSON path extraction over the events.props column (the reference
    has no JSON surface — SURVEY §2.7 notes Spark built-ins are exposed
    untranslated): get_json_object stays JVM-side and pushes the props
    column scan only."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


# -- as-of join (common OLAP/stream pattern Spark lacks natively) -----------

@register(
    "asof_purchase_last_signup",
    """WITH e AS (SELECT event_id, user_id, event_type,
                         epoch_ns(ts) // 1000 AS tus, value
                  FROM events),
    u AS (
      SELECT user_id, tus,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
             CASE WHEN event_type = 'signup' THEN event_id END AS sid,
             event_id, value
      FROM e WHERE event_type IN ('purchase', 'signup')),
    c AS (
      SELECT *,
             last_value(sid IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tus, is_p
               ROWS UNBOUNDED PRECEDING) AS last_signup_id
      FROM u)
    SELECT event_id AS purchase_id, user_id, round(value, 2) AS amount,
           last_signup_id
    FROM c WHERE is_p = 1""",
)
def asof_purchase_last_signup(spark, sf_dir):
    """As-of join (operators.asof): each purchase matched to the SAME
    user's most recent signup at-or-before it — union + running
    last_value, one shuffle, no pandas and no range-join blowup."""
    from semantic_cpp_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("tus", ts_micros(ev))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
        "tus",
    )
    signs = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("last_signup_id"), F.col("tus").alias("s_tus")
    )
    out = asof_join(
        buys, signs, key="user_id", left_time="tus", right_time="s_tus",
        right_payload=["last_signup_id"],
    )
    return out.select(
        "purchase_id", "user_id", F.round("amount", 2).alias("amount"),
        "last_signup_id",
    )


# -- rollup / grouping sets (Spark freebie, exposed untranslated) -----------

@register(
    "rel_rollup_order_priority",
    """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
              coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
              count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders
       GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
)
def rel_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals (status → priority → grand total): Spark's
    expanded grouping-sets aggregation, one shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n",
            "total",
        )
    )


@register(
    "rel_pivot_status_by_flag",
    """SELECT l_returnflag,
              round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_o,
              round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_f,
              count(*) FILTER (WHERE l_linestatus = 'O') AS n_o,
              count(*) FILTER (WHERE l_linestatus = 'F') AS n_f
       FROM lineitem GROUP BY l_returnflag""",
)
def rel_pivot(spark, sf_dir):
    """Pivot (wide aggregation): explicit pivot values keep it a single
    hash-aggregate with conditional aggregates — no extra pass to discover
    the column domain."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return out.select(
        "l_returnflag",
        F.col("O_qty").alias("qty_o"),
        F.col("F_qty").alias("qty_f"),
        F.col("O_n").alias("n_o"),
        F.col("F_n").alias("n_f"),
    )


# -- datetime / misc scalar coverage ----------------------------------------

@register(
    "rel_datetime_parts",
    """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
              count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders GROUP BY 1, 2""",
)
def rel_datetime_parts(spark, sf_dir):
    """Datetime part extraction + monthly aggregate (Spark builtins
    exposed untranslated — the reference has no date layer, SURVEY §2.7)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def str_levenshtein(spark, sf_dir):
    """Edit distance against an anchor string — the cheap fuzzy-match
    primitive (text-analysis extension; identical DP in both engines)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.levenshtein(F.col("p_name"), F.lit("standard brushed steel"))
        .cast("long")
        .alias("dist"),
    )


@register(
    "txt_word_count_topk",
    """WITH w AS (
         SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
         FROM documents)
       SELECT word, count(*) AS n
       FROM w GROUP BY word
       ORDER BY n DESC, word LIMIT 20""",
)
def txt_word_count(spark, sf_dir):
    """Corpus word count, top-20 — the canonical map-side-combinable
    aggregation (explode → partial+final count → TakeOrdered)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


@register(
    "agg_corr_covar",
    """SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
              round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_qty_price,
              round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_samp_qty_price
       FROM lineitem""",
)
def agg_corr_covar(spark, sf_dir):
    """Bivariate statistics: Pearson correlation and population/sample
    covariance (single-pass co-moment aggregation in both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.agg(
        F.round(F.corr(q, p), 6).alias("corr_qty_price"),
        F.round(F.covar_pop(q, p), 2).alias("covar_qty_price"),
        F.round(F.covar_samp(q, p), 2).alias("covar_samp_qty_price"),
    )


# -- round-3 additions: blob bytes source, join-converter collector,
# -- capped frequency collector ---------------------------------------------

@register(
    "src_blob_bytes",
    """WITH d AS (SELECT hex(encode(text)) AS h,
                         octet_length(encode(text))::BIGINT AS n
                  FROM documents WHERE doc_id = 2),
    i AS (SELECT unnest(range(5, least(260, n))) AS pos, h FROM d)
    SELECT pos - 5 AS idx,
           ('0x' || substr(h, (pos * 2 + 1)::INT, 2))::BIGINT AS byte
    FROM i""",
)
def src_blob_bytes(spark, sf_dir):
    """useBlob(text, start, end): a string's raw UTF-8 bytes as a stream,
    window [5, 260) clamped to the text, index re-based to the slice
    (reference semantic.h:2101-2138). Column form: blob_bytes builds
    array<int> via binary substring + hex — pure codegen, narrow, no UDF;
    the driver-side literal form is sources.use_blob_text (pytest-pinned).
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") == 2)
    ex = d.select(
        F.posexplode(strings.blob_bytes(F.col("text"))).alias("pos", "byte")
    )
    return ex.filter((F.col("pos") >= 5) & (F.col("pos") < 260)).select(
        (F.col("pos") - 5).cast("long").alias("idx"),
        F.col("byte").cast("long").alias("byte"),
    )


def str_compare_and_join(spark, sf_dir):
    """useJoin(prefix, converter, suffix) — comma-delimited converted join
    (reference collector.h:1296-1349, comma hard-coded at :1299) — plus
    the three-way compare (charsequence.h:1220-1249) summed as a second
    scalar. Two 1-row aggregates broadcast-crossed, no data-path collect."""
    from semantic_cpp_spark.sources import from_dataframe

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 10)
    sf = from_dataframe(p, "p_name", ["p_partkey"])
    joined = sf.join_str_converted("<<", strings.upper_ascii, ">>")
    cmp_total = p.agg(
        F.sum(
            strings.compare_cs(F.col("p_name"), F.lit("forest")).cast("long")
        ).alias("cmp_total")
    )
    return joined.crossJoin(F.broadcast(cmp_total))


@register(
    "grp_frequency_capped",
    f"""WITH {EV},
    r AS (SELECT event_type, idx,
                 row_number() OVER (PARTITION BY event_type ORDER BY idx) AS rn
          FROM ev),
    heads AS (SELECT event_type AS value,
                     string_agg(idx::VARCHAR, ',' ORDER BY idx) AS pos_head
              FROM r WHERE rn <= 8 GROUP BY event_type),
    cnts AS (SELECT event_type AS value, count(*)::BIGINT AS n_value
             FROM ev GROUP BY event_type),
    tot AS (SELECT count(*)::BIGINT AS total FROM ev)
    SELECT h.value, h.pos_head, c.n_value, t.total
    FROM heads h JOIN cnts c USING (value) CROSS JOIN tot t""",
)
def grp_frequency_capped(spark, sf_dir):
    """Bounded-memory frequency profile: first 8 occurrence positions per
    value + full counts (the capped pipeline-facing variant of
    useFrequency, collector.h:1805-1906 — r2 verdict's perf-weak fix).
    The cap applies BEFORE collection, so no unbounded collect_list."""
    ev = load_table(spark, sf_dir, "events")
    idxed = with_ordinal(ev, ["event_id"]).select(IDX, "event_type")
    prof = collectors.frequency_profile_capped(
        idxed, F.col("event_type"), 8
    )
    return prof.select(
        "value",
        F.array_join(
            F.transform("positions", lambda i: i.cast("string")), ","
        ).alias("pos_head"),
        "n_value",
        "total",
    )


@register(
    "agg_salted_hot_key",
    """SELECT event_type AS key, count(*) AS n,
              round(sum(value), 2) AS total, max(value) AS hi
       FROM events GROUP BY event_type""",
)
def agg_salted_hot_key(spark, sf_dir):
    """Skew-safe two-stage aggregation (operators/skew.py salting): the
    5-value event_type key is the hot-key shape — stage 1 spreads each
    key over 16 salt buckets, stage 2 merges partials. Results are
    identical to a plain groupBy (algebraic aggregates commute with the
    split), which is exactly what the oracle checks."""
    from semantic_cpp_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        F.col("event_type"),
        n=("sum", F.count(F.lit(1))),
        total=("sum", F.sum("value")),
        hi=("max", F.max("value")),
    )
    return out.select(
        "key", "n", F.round("total", 2).alias("total"), "hi"
    )


@register(
    "asof_next_purchase_after_signup",
    """WITH e AS (SELECT event_id, user_id, event_type,
                         epoch_ns(ts) // 1000 AS tus
                  FROM events),
    u AS (
      SELECT user_id, tus,
             CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS side,
             CASE WHEN event_type = 'purchase' THEN tus END AS ptus,
             event_id
      FROM e WHERE event_type IN ('purchase', 'signup')),
    c AS (
      SELECT *,
             first_value(ptus IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tus, side
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS t_next
      FROM u)
    SELECT event_id AS signup_id, user_id, tus AS t_signup, t_next,
           t_next - tus AS latency_us
    FROM c WHERE side = 0""",
)
def asof_next_purchase_after_signup(spark, sf_dir):
    """FORWARD as-of join (operators.asof.asof_join_forward): each
    signup matched to the SAME user's earliest purchase at-or-after it
    — union + running first_value over CURRENT..UNBOUNDED FOLLOWING,
    one key-partitioned window, the "what happened next" complement of
    asof_purchase_last_signup. Emitting the matched TIME keeps ties
    scalar-deterministic without a tiebreak column."""
    from semantic_cpp_spark.operators.asof import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("tus", ts_micros(ev))
    signs = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"),
        F.col("tus").alias("t_signup"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("tus").alias("p_tus"),
        F.col("tus").alias("t_next"),
    )
    out = asof_join_forward(
        signs, buys, key="user_id", left_time="t_signup",
        right_time="p_tus", right_payload=["t_next"],
    )
    return out.select(
        "signup_id", "user_id", "t_signup", "t_next",
        (F.col("t_next") - F.col("t_signup")).alias("latency_us"),
    )


_ASOF_NEAREST_SQL = """WITH e AS (SELECT event_id, user_id, event_type,
                         epoch_ns(ts) // 1000 AS tus
                  FROM events),
    p AS (SELECT user_id, event_id AS purchase_id, tus AS p_t
          FROM e WHERE event_type = 'purchase'),
    s AS (SELECT user_id, event_id AS signup_id, tus AS s_t
          FROM e WHERE event_type = 'signup'),
    j AS (SELECT p.user_id, p.purchase_id, s.signup_id, s.s_t, p.p_t,
                 row_number() OVER (
                   PARTITION BY p.purchase_id
                   ORDER BY abs(s.s_t - p.p_t), s.s_t, s.signup_id
                 ) AS rn
          FROM p LEFT JOIN s ON s.user_id = p.user_id)
    SELECT user_id, purchase_id, signup_id,
           (CASE WHEN signup_id IS NOT NULL
                 THEN abs(s_t - p_t) END)::BIGINT AS asof_dist
    FROM j WHERE rn = 1"""


def asof_nearest_signup(spark, sf_dir):
    """NEAREST as-of join (operators.asof.asof_join_nearest): each
    purchase matched to the SAME user's closest signup in TIME — before
    or after, whichever is nearer; equidistant ties take the earlier
    (backward) row. Spark composes the backward and forward
    union-window passes plus a Column argmin (two key-partitioned
    windows total, no range explosion); the oracle brute-forces the
    per-purchase argmin over an all-pairs user join — small at gate
    scale, and exactly the plan shape the operator exists to avoid.
    ``tiebreak="signup_id"`` threads through BOTH passes so two signups
    at the identical (user, time) resolve to min(signup_id) on every
    engine — matching the oracle's ORDER BY pin (ADVICE r8)."""
    from semantic_cpp_spark.operators.asof import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("tus", ts_micros(ev))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "tus",
    )
    signs = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("tus").alias("s_tus"),
    )
    out = asof_join_nearest(
        buys, signs, key="user_id", left_time="tus", right_time="s_tus",
        right_payload=["signup_id"], tiebreak="signup_id",
    )
    return out.select("user_id", "purchase_id", "signup_id", "asof_dist")


# 3 days in epoch-micros — wide enough that most purchases keep a match
# on the 30-day fixture span, narrow enough that a measurable fraction
# nulls out (both branches exercised at gate scale).
ASOF_TOL_US = 3 * 24 * 3600 * 1_000_000


_ASOF_TOL_SQL = f"""WITH e AS (SELECT event_id, user_id, event_type,
                          epoch_ns(ts) // 1000 AS tus
                   FROM events),
    p AS (SELECT user_id, event_id AS purchase_id, tus AS p_t
          FROM e WHERE event_type = 'purchase'),
    s AS (SELECT user_id, event_id AS signup_id, tus AS s_t
          FROM e WHERE event_type = 'signup'),
    j AS (SELECT p.user_id, p.purchase_id, s.signup_id, s.s_t, p.p_t,
                 row_number() OVER (
                   PARTITION BY p.purchase_id
                   ORDER BY abs(s.s_t - p.p_t), s.s_t, s.signup_id
                 ) AS rn
          FROM p LEFT JOIN s ON s.user_id = p.user_id
                            AND abs(s.s_t - p.p_t) <= {ASOF_TOL_US})
    SELECT user_id, purchase_id, signup_id,
           (CASE WHEN signup_id IS NOT NULL
                 THEN abs(s_t - p_t) END)::BIGINT AS asof_dist
    FROM j WHERE rn = 1"""


def asof_nearest_tol(spark, sf_dir):
    """NEAREST as-of join with a MAX-GAP tolerance (operators.asof,
    ``tolerance=`` — the pandas ``merge_asof(tolerance=)`` contract):
    each purchase matches the same user's closest signup only if it
    lies within ±3 days; beyond the gap the match nulls out
    (boundary-INCLUSIVE — a signup exactly 3 days away matches,
    pinned in test_asof_tolerance_boundary_inclusive). Same two
    key-partitioned union-window passes as asof_nearest_signup — the
    tolerance is a pure Column null-out before the argmin, zero extra
    exchanges; the oracle restricts its brute-force candidate set with
    the identical inclusive predicate."""
    from semantic_cpp_spark.operators.asof import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("tus", ts_micros(ev))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "tus",
    )
    signs = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("tus").alias("s_tus"),
    )
    out = asof_join_nearest(
        buys, signs, key="user_id", left_time="tus", right_time="s_tus",
        right_payload=["signup_id"], tiebreak="signup_id",
        tolerance=ASOF_TOL_US,
    )
    return out.select("user_id", "purchase_id", "signup_id", "asof_dist")


@register(
    "asof_nearest_family",
    f"""SELECT 'nearest' AS aspect, * FROM ({_ASOF_NEAREST_SQL}) __n
    UNION ALL
    SELECT 'tol' AS aspect, * FROM ({_ASOF_TOL_SQL}) __t""",
)
def asof_nearest_family(spark, sf_dir):
    """BOTH nearest-as-of variants under ONE gate (r13 gate
    consolidation — the members share an output schema (user_id,
    purchase_id, signup_id, asof_dist), so the union just tags the
    aspect and every member row survives verbatim). aspect='nearest' →
    unbounded nearest match; aspect='tol' → the ±3-day inclusive
    tolerance null-out (asof_join_nearest(tolerance=), both branches
    exercised at gate scale). Each branch is the same two
    key-partitioned union-window passes — no range explosion, no new
    exchange from the union."""
    cols = ["user_id", "purchase_id", "signup_id", "asof_dist"]
    n = asof_nearest_signup(spark, sf_dir).select(
        F.lit("nearest").alias("aspect"), *cols
    )
    t = asof_nearest_tol(spark, sf_dir).select(
        F.lit("tol").alias("aspect"), *cols
    )
    return n.unionByName(t)


# -- r14 gate consolidation: the four str_ singles under ONE family gate ----
# (the r13 option-(a) pattern, applied to the next family the capacity
# plan named: one driver row re-verifies the whole charsequence surface,
# reclaiming 3 rotation slots with no value coverage lost — every member
# row survives verbatim in the tagged union, the medley via a column
# unpivot so each of its 12 scalars stays an individually-hashed value.)

# NON-NULL INVARIANT (ADVICE r14): every medley scalar below is a
# TOTAL function of non-null p_name (the -1 / 0 sentinels make the
# partial ones total), so the oracle's UNPIVOT — which drops NULL
# cells by default in DuckDB — and the engine's stack() — which keeps
# them — see identical row sets. Adding a NULLABLE member column here
# would silently diverge the two sides' row counts: either coalesce
# the new column to a sentinel on BOTH sides or switch the oracle to
# an explicit UNION ALL of casts before extending this list.
_STR_MEDLEY_COLS = [
    "up", "pos_a", "n_a", "snake", "snake2", "rev", "mid", "starts_b",
    "has_ol", "last_ol", "last_a_from5", "cmp_forest",
]

_STR_FAMILY_SQL = """WITH med AS (
  SELECT p_partkey,
         translate(p_name, 'abcdefghijklmnopqrstuvwxyz',
                           'ABCDEFGHIJKLMNOPQRSTUVWXYZ') AS up,
         (strpos(p_name, 'a') - 1)::BIGINT AS pos_a,
         ((length(p_name) - length(replace(p_name, 'a', ''))))::BIGINT AS n_a,
         replace(p_name, ' ', '_') AS snake,
         regexp_replace(regexp_replace(p_name, ' ', '_'), ' ', '_') AS snake2,
         reverse(p_name) AS rev,
         substr(p_name, 3, 8) AS mid,
         p_name LIKE 'b%' AS starts_b,
         contains(p_name, 'ol') AS has_ol,
         (CASE WHEN strpos(reverse(p_name), 'lo') = 0 THEN -1
               ELSE length(p_name) - strpos(reverse(p_name), 'lo') - 1
          END)::BIGINT AS last_ol,
         (CASE WHEN 5 >= length(p_name) THEN -1
               WHEN strpos(reverse(substr(p_name, 1, 6)), 'a') = 0 THEN -1
               ELSE 6 - strpos(reverse(substr(p_name, 1, 6)), 'a')
          END)::BIGINT AS last_a_from5,
         (CASE WHEN p_name < 'forest' THEN -1
               WHEN p_name > 'forest' THEN 1 ELSE 0 END)::BIGINT AS cmp_forest
  FROM part),
cpx AS (
  WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey <= 20),
  pos AS (SELECT p_partkey, p_name, unnest(range(1, length(p_name) + 1)) AS i
          FROM p)
  SELECT p_partkey, i - 1 AS pos, substr(p_name, i::INT, 1) AS ch,
         ord(substr(p_name, i::INT, 1))::BIGINT AS cp
  FROM pos),
lev AS (
  SELECT p_partkey, levenshtein(p_name, 'standard brushed steel') AS dist
  FROM part WHERE p_partkey <= 100),
jn AS (
  WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey <= 10)
  SELECT '<<' || string_agg(translate(p_name,
                  'abcdefghijklmnopqrstuvwxyz',
                  'ABCDEFGHIJKLMNOPQRSTUVWXYZ'), ',' ORDER BY p_partkey)
             || '>>' AS value,
         sum(CASE WHEN p_name < 'forest' THEN -1
                  WHEN p_name > 'forest' THEN 1 ELSE 0 END)::BIGINT AS cmp_total
  FROM p)
SELECT 'medley' AS aspect, id1, CAST(NULL AS BIGINT) AS id2, skey, sval
FROM (
  SELECT p_partkey::BIGINT AS id1, up::VARCHAR AS up, pos_a::VARCHAR AS pos_a,
         n_a::VARCHAR AS n_a, snake, snake2, rev, mid,
         starts_b::VARCHAR AS starts_b, has_ol::VARCHAR AS has_ol,
         last_ol::VARCHAR AS last_ol, last_a_from5::VARCHAR AS last_a_from5,
         cmp_forest::VARCHAR AS cmp_forest
  FROM med)
  UNPIVOT (sval FOR skey IN (up, pos_a, n_a, snake, snake2, rev, mid,
                             starts_b, has_ol, last_ol, last_a_from5,
                             cmp_forest))
UNION ALL
SELECT 'cp', p_partkey::BIGINT, pos::BIGINT, ch, cp::VARCHAR FROM cpx
UNION ALL
SELECT 'lev', p_partkey::BIGINT, CAST(NULL AS BIGINT), 'dist', dist::VARCHAR
FROM lev
UNION ALL
SELECT 'join', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), 'value', value
FROM jn
UNION ALL
SELECT 'join', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), 'cmp_total',
       cmp_total::VARCHAR
FROM jn"""


@register("str_family", _STR_FAMILY_SQL)
def str_family(spark, sf_dir):
    """ALL four charsequence gates under ONE family gate (r14 gate
    consolidation, the r13 option-(a) pattern): aspect='medley' unpivots
    the 12-scalar charsequence medley to one (id1=p_partkey, skey=column,
    sval=value-as-string) row per scalar — every member value survives
    verbatim, individually hashed; aspect='cp' is the useSequence
    codepoint stream (id1=p_partkey, id2=pos, skey=ch, sval=codepoint);
    aspect='lev' the anchor edit distance; aspect='join' the two
    useJoin/compare scalars. The union is four independent scan-shaped
    branches over `part` — no new exchange beyond the members' own.
    Members keep their engine entry points (str_medley, str_codepoints,
    str_levenshtein, str_compare_and_join) — only their registrations
    consolidated (registry 237 → 234, +0.6 rotation slots/round)."""
    nul = F.lit(None).cast("long")
    med = str_medley(spark, sf_dir)
    stack = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _STR_MEDLEY_COLS
    )
    med_u = med.select(
        F.lit("medley").alias("aspect"),
        F.col("p_partkey").cast("long").alias("id1"),
        nul.alias("id2"),
        F.expr(f"stack({len(_STR_MEDLEY_COLS)}, {stack}) AS (skey, sval)"),
    ).select("aspect", "id1", "id2", "skey", "sval")
    cp = str_codepoints(spark, sf_dir).select(
        F.lit("cp").alias("aspect"),
        F.col("p_partkey").cast("long").alias("id1"),
        F.col("pos").cast("long").alias("id2"),
        F.col("ch").alias("skey"),
        F.col("cp").cast("string").alias("sval"),
    )
    lv = str_levenshtein(spark, sf_dir).select(
        F.lit("lev").alias("aspect"),
        F.col("p_partkey").cast("long").alias("id1"),
        nul.alias("id2"),
        F.lit("dist").alias("skey"),
        F.col("dist").cast("string").alias("sval"),
    )
    jn = str_compare_and_join(spark, sf_dir)
    jn_u = jn.select(
        F.lit("join").alias("aspect"),
        nul.alias("id1"),
        nul.alias("id2"),
        F.lit("value").alias("skey"),
        F.col("value").alias("sval"),
    ).unionByName(
        jn.select(
            F.lit("join").alias("aspect"),
            nul.alias("id1"),
            nul.alias("id2"),
            F.lit("cmp_total").alias("skey"),
            F.col("cmp_total").cast("string").alias("sval"),
        )
    )
    return med_u.unionByName(cp).unionByName(lv).unionByName(jn_u)
