"""Feature-store / data-curation queries: point-in-time correctness,
embedding-space diagnostics, and classifier-based quality filtering.

The point-in-time (PIT) join is the training-data-correctness shape:
joining a fact to the dimension version that was valid AT THE FACT'S
event time — never a later one — is what prevents label leakage when
features are assembled for supervised training. Reference engines ship
it as `ASOF JOIN` / temporal tables; here it is an interval join
against SCD2 validity windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_spark.queries.registry import register
from stream_spark.sources import load_table


@register(
    "events_pit_dimension_join",
    oracle="""
    WITH dim AS (
        SELECT user_id, value AS dim_value,
               ts AS vf,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                   AS dim_version
        FROM events WHERE event_type = 'view'
    )
    SELECT f.event_id, f.user_id,
           CAST(epoch_ms(f.ts) AS BIGINT) AS ts_ms,
           d.dim_version, d.dim_value,
           CAST(epoch_ms(d.vf) AS BIGINT) AS dim_since_ms
    FROM events f
    LEFT JOIN dim d
      ON f.user_id = d.user_id AND f.ts >= d.vf AND (d.vt IS NULL OR f.ts < d.vt)
    WHERE f.event_type = 'purchase'
    """,
)
def events_pit_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase is enriched with the user-state
    version (built SCD2-style from 'view' events, half-open validity
    intervals [ts, next_ts)) that was valid AT the purchase's event
    time — the feature-store shape that prevents label leakage in
    training-data assembly.

    Exactly one interval can match a purchase (the intervals partition
    [first_view, inf) per user; a same-(user,ts) view pair yields one
    zero-length interval that matches nothing, so the (ts, event_id)
    tie-break is deterministic in both engines). Purchases before the
    user's first view survive with NULL state (left join).

    Scale: one keyed window builds the intervals (partition by user,
    never global), then a left equi-join ON user_id with the range
    residual — per-key fan-out is bounded by that user's version
    count, and AQE skew-splitting covers hot users. At extreme
    versions-per-key the two-frame as-of primitive
    (events_asof_nearest_click) is the fallback shape.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("_duid"),
            F.col("value").alias("dim_value"),
            F.col("ts").alias("_vf"),
            F.lead("ts").over(w).alias("_vt"),
            F.row_number().over(w).cast("long").alias("dim_version"),
        )
    )
    fact = ev.filter(F.col("event_type") == "purchase")
    return (
        fact.join(
            dim,
            (fact["user_id"] == dim["_duid"])
            & (fact["ts"] >= dim["_vf"])
            & (dim["_vt"].isNull() | (fact["ts"] < dim["_vt"])),
            "left",
        )
        .select(
            "event_id",
            "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            "dim_version",
            "dim_value",
            F.unix_millis(F.col("_vf").cast("timestamp")).alias("dim_since_ms"),
        )
    )


@register(
    "embeddings_outlier_filter",
    oracle="""
    WITH el AS (
        SELECT em.label, em.vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings em, unnest(generate_series(1, len(embedding))) t(i)
    ),
    sums AS (
        SELECT label, i, CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS s
        FROM el GROUP BY label, i
    ),
    lnorm AS (
        SELECT label, sqrt(CAST(SUM(CAST(s * s AS DECIMAL(28,12))) AS DOUBLE)) AS ns
        FROM sums GROUP BY label
    ),
    per_vec AS (
        SELECT el.label, el.vec_id,
               CAST(SUM(CAST(el.x * su.s AS DECIMAL(28,12))) AS DOUBLE) AS dot,
               sqrt(CAST(SUM(CAST(el.x * el.x AS DECIMAL(28,12))) AS DOUBLE)) AS nv
        FROM el JOIN sums su ON el.label = su.label AND el.i = su.i
        GROUP BY el.label, el.vec_id
    ),
    scored AS (
        SELECT p.vec_id, p.label, p.dot / (p.nv * ln.ns) AS centroid_cos
        FROM per_vec p JOIN lnorm ln ON p.label = ln.label
    ),
    cnts AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM scored GROUP BY label),
    ranked AS (
        SELECT s.vec_id, s.label, s.centroid_cos,
               CAST(row_number() OVER (
                   PARTITION BY s.label ORDER BY s.centroid_cos, s.vec_id
               ) AS BIGINT) AS rn,
               c.n
        FROM scored s JOIN cnts c ON s.label = c.label
    )
    SELECT vec_id, CAST(label AS BIGINT) AS label, centroid_cos,
           (rn - 1) * 10 // n AS decile,
           ((rn - 1) * 10 // n = 0) AS is_outlier
    FROM ranked
    """,
)
def embeddings_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding outlier detection for label-noise curation:
    each vector scored by cosine to its OWN label's centroid (the label
    SUM vector — same direction as the mean, so the decimal mean
    division never happens), the bottom decile per label flagged.

    Portable arithmetic end to end: decimal per-(label,dim) sums, the
    per-vector dot against the bounded label×dim sum table, IEEE
    division only at the surfaced cosine, and the decile via the
    engine-portable floor((rn-1)·10/n) integer formula (never SQL
    ntile — remainder buckets are engine-specific).

    Scale: one (label, dim) keyed aggregate (bounded: labels × dims),
    one keyed join back to the exploded stream, per-label windows —
    no pairwork, no global sort; linear at any corpus size."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    el = emb.select("label", "vec_id", F.posexplode("embedding").alias("i0", "xf")).select(
        "label", "vec_id", (F.col("i0") + 1).alias("i"), F.col("xf").cast("double").alias("x")
    )
    dec = lambda c: F.sum(c.cast("decimal(28,12)")).cast("double")  # noqa: E731
    sums = el.groupBy("label", "i").agg(dec(F.col("x")).alias("s"))
    lnorm = sums.groupBy("label").agg(F.sqrt(dec(F.col("s") * F.col("s"))).alias("ns"))
    per_vec = (
        el.join(sums, ["label", "i"])
        .groupBy("label", "vec_id")
        .agg(
            dec(F.col("x") * F.col("s")).alias("dot"),
            F.sqrt(dec(F.col("x") * F.col("x"))).alias("nv"),
        )
    )
    scored = per_vec.join(lnorm, "label").select(
        "vec_id", "label", (F.col("dot") / (F.col("nv") * F.col("ns"))).alias("centroid_cos")
    )
    cnts = scored.groupBy("label").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("label").orderBy("centroid_cos", "vec_id")
    ranked = scored.withColumn("rn", F.row_number().over(w).cast("long")).join(
        F.broadcast(cnts), "label"  # broadcast-ok: one row per label (bounded class count)
    )
    decile = F.expr("(rn - 1) * 10 DIV n")
    return ranked.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        "centroid_cos",
        decile.alias("decile"),
        (decile == 0).alias("is_outlier"),
    )


@register(
    "documents_langid_classifier",
    oracle="""
    WITH n AS (SELECT doc_id, lang, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
               FROM documents),
    toked AS (SELECT doc_id, lang, string_split_regex(norm, '\\s+') AS ws FROM n),
    tr AS (SELECT lang AS lang_c, unnest(ws) AS w FROM toked WHERE doc_id % 2 = 0),
    cls AS (SELECT lang_c, CAST(COUNT(*) AS BIGINT) AS tok_c FROM tr GROUP BY lang_c),
    v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tr),
    rates AS (
        SELECT tr.lang_c, tr.w,
               CAST((COUNT(*) + 1) * 1000000 // (ANY_VALUE(cls.tok_c) + ANY_VALUE(v.v)) AS BIGINT) AS rate
        FROM tr JOIN cls USING (lang_c) CROSS JOIN v
        GROUP BY tr.lang_c, tr.w
    ),
    floors AS (
        SELECT lang_c, CAST(1000000 // (tok_c + v.v) AS BIGINT) AS floor_rate
        FROM cls CROSS JOIN v
    ),
    te AS (SELECT doc_id, lang, unnest(ws) AS w FROM toked WHERE doc_id % 2 = 1),
    scores AS (
        SELECT te.doc_id, te.lang, f.lang_c,
               CAST(SUM(COALESCE(r.rate, f.floor_rate)) AS BIGINT) AS s
        FROM te CROSS JOIN floors f
        LEFT JOIN rates r ON r.w = te.w AND r.lang_c = f.lang_c
        GROUP BY te.doc_id, te.lang, f.lang_c
    ),
    ms AS (SELECT doc_id, MAX(s) AS ms FROM scores GROUP BY doc_id)
    SELECT s.doc_id, s.lang, MIN(s.lang_c) AS pred_lang,
           (MIN(s.lang_c) = s.lang) AS is_correct
    FROM scores s JOIN ms ON s.doc_id = ms.doc_id AND s.s = ms.ms
    GROUP BY s.doc_id, s.lang
    """,
)
def documents_langid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised multiclass text classifier, trained AND applied
    distributed — the fastText-style filter slot in a curation pipeline
    (here predicting `lang` so accuracy is measurable against the
    held-out truth; swapping the label column trains a quality/domain
    classifier on the same plan).

    Multinomial scoring with NO libm: per-(token, class) Laplace rates
    as exact BIGINT ppm — ``(cnt+1)·1e6 DIV (tok_c + V)`` — a test doc
    scores Σ rates over its token occurrences (same token count for
    every class, so the argmax over sums equals the argmax over means),
    unseen tokens contribute the class floor ``1e6 DIV (tok_c + V)``.
    Argmax is spelled engine-portably: max score per doc, then MIN class
    label among the achievers (no max_by — its tie order is
    engine-specific).

    Scale: train counts are one (class, token) keyed aggregate (vocab ×
    classes, distributed); the per-class denominator table (tok_c + V)
    is ≤|classes| rows, eagerly localCheckpointed so the 1-row global
    vocab aggregate runs ONCE as a bounded side job and never re-expands
    into the inference plan (zero single-partition exchanges there);
    inference is the test token stream fanned out over the
    ≤|classes|-row class table and left-joined against the rate table
    on (token, class) — keyed, AQE-skew-safe, linear in corpus size.
    Per-doc argmax is a doc-keyed window max, never a global sort."""
    from stream_spark.operators.text import normalize_text, tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", "lang", tokens(normalize_text(F.col("text"))).alias("ws"))
    tr = toked.filter(F.col("doc_id") % 2 == 0).select(
        F.col("lang").alias("lang_c"), F.explode("ws").alias("w")
    )
    cls = tr.groupBy("lang_c").agg(F.count("*").cast("long").alias("tok_c"))
    vocab = tr.agg(F.countDistinct("w").cast("long").alias("v"))
    # ≤|classes| rows by construction (one per label) — the model's
    # denominator table; eager localCheckpoint truncates lineage so the
    # global vocab aggregate is a one-off bounded job, not a subtree
    # duplicated per downstream reference.
    denoms = (
        cls.crossJoin(F.broadcast(vocab))  # broadcast-ok: 1-row global vocab count
        .select(
            "lang_c",
            (F.col("tok_c") + F.col("v")).alias("denom"),
            F.expr("1000000 DIV (tok_c + v)").cast("long").alias("floor_rate"),
        )
        .localCheckpoint(eager=True)
    )
    rates = (
        tr.groupBy("lang_c", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .join(F.broadcast(denoms), "lang_c")  # broadcast-ok: one row per class
        .select("lang_c", "w", F.expr("(cnt + 1) * 1000000 DIV denom").cast("long").alias("rate"))
    )
    te = toked.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", F.explode("ws").alias("w")
    )
    scores = (
        # broadcast-ok: one row per class (bounded label set)
        te.crossJoin(F.broadcast(denoms.select("lang_c", "floor_rate")))
        .join(rates, ["w", "lang_c"], "left")
        .groupBy("doc_id", "lang", "lang_c")
        .agg(F.sum(F.coalesce(F.col("rate"), F.col("floor_rate"))).cast("long").alias("s"))
    )
    best = scores.withColumn("ms", F.max("s").over(Window.partitionBy("doc_id")))
    return (
        best.filter(F.col("s") == F.col("ms"))
        .groupBy("doc_id", "lang")
        .agg(F.min("lang_c").alias("pred_lang"))
        .select("doc_id", "lang", "pred_lang", (F.col("pred_lang") == F.col("lang")).alias("is_correct"))
    )


@register(
    "events_value_quantile_transform",
    oracle="""
    WITH r AS (
        SELECT event_id, value,
               CAST(row_number() OVER (ORDER BY value, event_id) AS BIGINT) AS rn
        FROM events
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM events)
    SELECT r.event_id, r.value,
           CAST((r.rn - 1) * 1000000 // (n.nn - 1) AS BIGINT) AS q_ppm
    FROM r CROSS JOIN n
    """,
)
def events_value_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (rank) normalization of a feature column — the
    distribution-free preprocessing transform (sklearn
    QuantileTransformer's rank step): each value maps to its corpus
    rank as exact integer ppm of [0, 1e6], so downstream models see a
    uniform marginal regardless of the raw distribution, and the
    mapping is identical on any engine (ties broken by event_id — a
    deterministic total order, no interpolation ulp hazard).

    Scale: the global rank is the two-pass partition-offset rownum
    (range exchange + bounded offsets — never a single-partition
    sort); the denominator is a driver-side bounded count; the ppm
    arithmetic is a map-side exact DIV."""
    from stream_spark.operators.rownum import with_global_row_number

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    r = with_global_row_number(ev, ["value", "event_id"])
    nn = r.count()  # driver-side bounded count (one scalar)
    return r.select(
        "event_id",
        "value",
        F.expr(f"(rn - 1) * 1000000 DIV {nn - 1}").cast("long").alias("q_ppm"),
    )
