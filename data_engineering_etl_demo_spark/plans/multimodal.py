"""Multimodal pipeline queries + DuckDB oracles.

The Spark path runs real Arrow-batched ``mapInPandas`` decode / frame-sample
stages over a BINARY payload column (operators/multimodal.py); the oracle
recomputes the same deterministic features from ``octet_length`` and
lowercase-hex slicing, so the driver hash-checks the full pandas-UDF path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.catalog import load
from data_engineering_etl_demo_spark.operators import multimodal as M
from data_engineering_etl_demo_spark.plans import register

_MT = (
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/synthetic' "
    "WHEN 1 THEN 'audio/synthetic' ELSE 'video/synthetic' END"
)

SQL_DECODE = f"""
    WITH m AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n,
               {_MT} AS media_type
        FROM documents
    )
    SELECT doc_id, media_type, n AS n_bytes,
           CASE WHEN media_type NOT LIKE 'audio%' THEN CAST(n % 64 + 1 AS INT) END AS width,
           CASE WHEN media_type NOT LIKE 'audio%' THEN CAST(n // 64 % 64 + 1 AS INT) END AS height,
           CASE WHEN media_type LIKE 'audio%' THEN 1 ELSE 3 END AS channels,
           CASE WHEN media_type LIKE 'video%' THEN CAST(n % 7 + 2 AS INT) ELSE 1 END AS n_frames,
           CASE WHEN media_type LIKE 'audio%' THEN 16000 END AS sample_rate
    FROM m
    ORDER BY doc_id
"""

SQL_FRAMES = f"""
    WITH v AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n,
               lower(hex(encode(text))) AS hx
        FROM documents
        WHERE doc_id % 3 = 2
    ),
    p AS (
        SELECT doc_id, hx,
               CAST(n % 7 + 2 AS INT) AS n_frames,
               n // (n % 7 + 2) AS frame_size
        FROM v
    )
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           CAST(frame_size AS BIGINT) AS frame_n_bytes,
           md5(substr(hx, f * frame_size * 2 + 1, frame_size * 2)) AS frame_md5
    FROM p, generate_series(0, {M.MAX_SAMPLED_FRAMES - 1}) AS g(f)
    WHERE f < least(n_frames, {M.MAX_SAMPLED_FRAMES})
    ORDER BY doc_id, frame_idx
"""


@register(
    "multimodal_decode",
    SQL_DECODE,
    doc="binary media column → Arrow-batched mapInPandas decode (stubbed codec).",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synth_media(load(spark, sf_dir, "documents"))
    return M.decode_media_features(media).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    SQL_FRAMES,
    doc="video payload → 1:N frame sampling explode inside one Arrow pass.",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synth_media(load(spark, sf_dir, "documents"))
    return M.sample_frames(media).orderBy("doc_id", "frame_idx")


_SQL_RESIZE = f"""
    WITH m AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n,
               lower(hex(encode(text))) AS hx
        FROM documents
        WHERE doc_id % 3 = 0
    ),
    p AS (
        SELECT doc_id, n, hx,
               greatest(1, n // {M.RESIZE_TARGET_BYTES}) AS stride
        FROM m
    ),
    r AS (
        SELECT doc_id, n, hx, stride,
               least((n + stride - 1) // stride, {M.RESIZE_TARGET_BYTES}) AS rn
        FROM p
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(n % 64 + 1 AS INT) AS width,
           CAST(n // 64 % 64 + 1 AS INT) AS height,
           CAST(rn % 64 + 1 AS INT) AS new_width,
           CAST(rn // 64 % 64 + 1 AS INT) AS new_height,
           CAST(rn AS BIGINT) AS resized_n_bytes,
           md5(array_to_string(list_transform(range(0, rn),
               i -> substr(hx, i * stride * 2 + 1, 2)), '')) AS resized_md5
    FROM r
    ORDER BY doc_id
"""


@register(
    "multimodal_resize",
    _SQL_RESIZE,
    doc="image payload resize (stubbed codec: deterministic byte "
    "subsampling, stride = n // target) — binary in, smaller binary out, "
    "metadata recomputed, md5 of the resized payload; one Arrow pass.",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synth_media(load(spark, sf_dir, "documents"))
    return M.resize_images(media).orderBy("doc_id")


_SQL_AUDIO = """
    WITH a AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n,
               lower(hex(encode(text))) AS hx
        FROM documents
        WHERE doc_id % 3 = 1
    ),
    b AS (
        SELECT doc_id, n,
               list_transform(range(0, n),
                   i -> CAST((instr('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
                             + instr('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1
                        AS BIGINT)) AS bytes
        FROM a
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(list_sum(bytes) AS BIGINT) AS sum_amp,
           CAST(list_sum(list_transform(bytes, x -> x * x)) AS BIGINT) AS sum_sq,
           floor(CAST(list_sum(bytes) AS BIGINT) / CAST(n AS DOUBLE) * 1e6) / 1e6 AS mean_amp
    FROM b
    ORDER BY doc_id
"""


@register(
    "multimodal_audio_features",
    _SQL_AUDIO,
    doc="audio feature extraction (stubbed codec: payload bytes as uint8 "
    "PCM) — amplitude count/sum/sum-of-squares as exact integers plus a "
    "floor-truncated mean, all reproduced by the oracle from the hex "
    "encoding.",
)
def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synth_media(load(spark, sf_dir, "documents"))
    return M.audio_features(media).orderBy("doc_id")


_SQL_PATCHES = f"""
    WITH m AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n,
               lower(hex(encode(text))) AS hx
        FROM documents
        WHERE doc_id % 3 = 0
    ),
    p AS (
        SELECT doc_id, n, hx,
               CAST(g AS INT) AS patch,
               (g * n) // {M.PATCH_GRID * M.PATCH_GRID} AS lo,
               ((g + 1) * n) // {M.PATCH_GRID * M.PATCH_GRID} AS hi
        FROM m, generate_series(0, {M.PATCH_GRID * M.PATCH_GRID - 1}) AS t(g)
    )
    SELECT doc_id,
           CAST(patch // {M.PATCH_GRID} AS INT) AS patch_row,
           CAST(patch % {M.PATCH_GRID} AS INT) AS patch_col,
           CAST(hi - lo AS BIGINT) AS patch_n_bytes,
           CAST(coalesce(list_sum(list_transform(range(lo, hi),
               i -> CAST((instr('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
                         + instr('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1
                    AS BIGINT))), 0) AS BIGINT) AS patch_sum,
           md5(substr(hx, lo * 2 + 1, (hi - lo) * 2)) AS patch_md5
    FROM p
    ORDER BY doc_id, patch_row, patch_col
"""


@register(
    "multimodal_patch_grid",
    _SQL_PATCHES,
    doc="ViT-style 4×4 patch tiling of image payloads — 1→16 row explode "
    "inside one Arrow pass, exact integer patch boundaries "
    "(⌊p·n/16⌋), per-patch byte count / exact amplitude sum / "
    "hex-slice md5, all reproduced by the oracle from the hex encoding.  "
    "The batch-prep stage a vision pipeline runs before patch embedding; "
    "per-split parallel at any scale, no shuffle before the final sort.",
)
def q_multimodal_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synth_media(load(spark, sf_dir, "documents"))
    return M.patch_grid(media).orderBy("doc_id", "patch_row", "patch_col")


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (aHash over the patch grid)
# ---------------------------------------------------------------------------

_G2 = M.PATCH_GRID * M.PATCH_GRID

_SQL_PHASH = f"""
    WITH m AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n,
               lower(hex(encode(text))) AS hx
        FROM documents
        WHERE doc_id % 3 = 0 AND octet_length(encode(text)) > 0
    ),
    p AS (
        SELECT doc_id, hx,
               CAST(g AS INT) AS patch,
               (g * n) // {_G2} AS lo,
               ((g + 1) * n) // {_G2} AS hi
        FROM m, generate_series(0, {_G2 - 1}) AS t(g)
    ),
    s AS (
        SELECT doc_id, patch,
               CAST(hi - lo AS BIGINT) AS pn,
               CAST(coalesce(list_sum(list_transform(range(lo, hi),
                   i -> CAST((instr('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
                             + instr('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1
                        AS BIGINT))), 0) AS BIGINT) AS ps
        FROM p
    ),
    img AS (
        SELECT doc_id, CAST(SUM(ps) AS BIGINT) AS tot,
               CAST(SUM(pn) AS BIGINT) AS nb
        FROM s GROUP BY 1
    ),
    ph AS (
        SELECT s.doc_id,
               CAST(SUM(CASE WHEN pn > 0
                             AND (ps * 1000000) // pn >= (tot * 1000000) // nb
                             THEN (1::BIGINT << patch) ELSE 0::BIGINT END)
                    AS BIGINT) AS phash
        FROM s JOIN img USING (doc_id)
        GROUP BY 1
    )
    SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_images, MIN(doc_id) AS keep_id
    FROM ph GROUP BY 1 ORDER BY phash
"""


@register(
    "multimodal_phash_dedup",
    _SQL_PHASH,
    doc="Perceptual-hash (aHash) image dedup: each image's 16 patch means "
    "threshold against the image mean into a 16-bit hash (bit p = patch "
    "p at-or-above average brightness), and images bucket by hash — the "
    "modality-side near-dup operator that connects the multimodal stack "
    "to the dedup stack (visually-identical payloads collide even when "
    "bytes differ in the below-average regions).  Means are compared in "
    "exact integer fixed-point (sum·1e6 div count — no float division), "
    "so both engines set identical bits.  Plan: the patch relation from "
    "the Arrow pass aggregates per image twice (totals, then bits with "
    "the totals joined back — co-partitioned on doc_id), then a tiny "
    "hash-keyed census.  At 100 TB the census input is one 16-bit-ish "
    "row per image; the heavy bytes never shuffle.",
)
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synth_media(
        load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    )
    s = M.patch_grid(media).select(
        "doc_id",
        (F.col("patch_row") * M.PATCH_GRID + F.col("patch_col")).alias(
            "patch"
        ),
        F.col("patch_n_bytes").alias("pn"),
        F.col("patch_sum").alias("ps"),
    )
    img = s.groupBy(F.col("doc_id").alias("i_doc")).agg(
        F.sum("ps").cast("long").alias("tot"),
        F.sum("pn").cast("long").alias("nb"),
    )
    bit = F.when(
        (F.col("pn") > 0)
        & (
            F.expr("(ps * 1000000) DIV pn")
            >= F.expr("(tot * 1000000) DIV nb")
        ),
        F.expr("shiftleft(1L, patch)"),
    ).otherwise(F.lit(0).cast("long"))
    ph = (
        s.join(img, s["doc_id"] == F.col("i_doc"))
        .groupBy("doc_id")
        .agg(F.sum(bit).cast("long").alias("phash"))
    )
    return (
        ph.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("keep_id"),
        )
        .orderBy("phash")
    )


@register(
    "multimodal_format_census",
    f"""
    WITH d AS ({SQL_DECODE})
    SELECT media_type,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(max(coalesce(width, 0)) AS BIGINT) AS max_width,
           CAST(max(coalesce(height, 0)) AS BIGINT) AS max_height,
           CAST(sum(n_frames) AS BIGINT) AS total_frames
    FROM d
    GROUP BY media_type
    ORDER BY media_type
    """,
    doc="Binary-column census per media format — the first audit any "
    "multimodal ingest publishes (how many assets, how many bytes, the "
    "dimension envelope, the frame budget): a rollup directly over the "
    "Arrow-batched decode stage's typed metadata, so the heavy bytes "
    "never shuffle — the exchange carries 3 format rows.  The oracle "
    "composes the same aggregate over the decode oracle's CTE.",
)
def q_multimodal_format_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synth_media(load(spark, sf_dir, "documents"))
    d = M.decode_media_features(media)
    return (
        d.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.max(F.coalesce(F.col("width"), F.lit(0)))
            .cast("long")
            .alias("max_width"),
            F.max(F.coalesce(F.col("height"), F.lit(0)))
            .cast("long")
            .alias("max_height"),
            F.sum("n_frames").cast("long").alias("total_frames"),
        )
        .orderBy("media_type")
    )
