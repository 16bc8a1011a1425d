"""Multimodal oracle queries — real BMP/WAV decode, resize, verdicts.

These make the multimodal family first-class in the correctness gate:
the Spark side runs the REAL codec path (functions.media_codecs via
mapInPandas — actual pixel/sample decode, actual nearest-neighbor
resize with re-encode), and the DuckDB twin re-derives every output
from the SAME persisted payload blobs using hex arithmetic only:

- header fields parse as little-endian ints from hex nibbles
  (``strpos('0123456789ABCDEF', …)`` — the md5-nibble trick from
  queries_lsh, applied to container formats);
- pixel/sample means aggregate over ``unnest(range(n))`` byte offsets
  (padding-aware for BMP rows);
- the resized payload is reconstructed BYTE-FOR-BYTE in SQL — header
  emitted from target dims, body via the integer nearest-neighbor
  mapping ``src = (dst * size) // target`` over the source hex — and
  checked by sha256 equality against Spark's re-encoded output.

Everything is derived from one deterministic persisted table
(``synthesize_codec_payloads`` → parquet), so the queries are
scale-factor-independent and the oracle reads byte-identical input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zparse_spark.queries import register

_W = "/root/repo/spark-warehouse/oracle"
_N_MEDIA = 96
_MAX_SIDE = 8  # small enough that every synthesized image actually shrinks

_HEXD = "0123456789ABCDEF"


# -- SQL fragment emitters: LE integer parsing from the `hx` hex column ----


def _nib(p: str) -> str:
    return f"(strpos('{_HEXD}', substr(hx, CAST({p} AS INT), 1)) - 1)"


def _byte(o: str) -> str:
    return f"(16 * {_nib(f'2*({o})+1')} + {_nib(f'2*({o})+2')})"


def _le16(o: str) -> str:
    return f"({_byte(f'{o}')} + 256 * {_byte(f'({o})+1')})"


def _le32(o: str) -> str:
    return (
        f"({_byte(f'{o}')} + 256 * {_byte(f'({o})+1')} "
        f"+ 65536 * {_byte(f'({o})+2')} + 16777216 * {_byte(f'({o})+3')})"
    )


def _sle32(o: str) -> str:
    u = _le32(o)
    return f"(CASE WHEN {u} >= 2147483648 THEN {u} - 4294967296 ELSE {u} END)"


def _pairhex(e: str) -> str:
    return (
        f"(substr('{_HEXD}', CAST(({e}) // 16 AS INT) + 1, 1) || "
        f"substr('{_HEXD}', CAST(({e}) % 16 AS INT) + 1, 1))"
    )


def _le32hex(e: str) -> str:
    return (
        f"({_pairhex(f'({e}) % 256')} || {_pairhex(f'(({e}) // 256) % 256')} || "
        f"{_pairhex(f'(({e}) // 65536) % 256')} || {_pairhex(f'(({e}) // 16777216) % 256')})"
    )


_MEDIA_READY = False


def _media_input(spark):
    """Persist the deterministic codec-payload table; read it back so
    Spark and DuckDB see byte-identical blobs (the _pack_input pattern,
    including its write-once-per-process memo — the payload table is a
    pure function of _N_MEDIA)."""
    global _MEDIA_READY
    if not _MEDIA_READY:
        from zparse_spark.multimodal import synthesize_codec_payloads

        synthesize_codec_payloads(spark, n_media=_N_MEDIA).write.mode("overwrite").parquet(
            f"{_W}/media_payloads"
        )
        _MEDIA_READY = True
    return spark.read.parquet(f"{_W}/media_payloads")




# ZVID per-frame validity (classify_payload's frame loop as a correlated
# NOT EXISTS over the frame index): frame fi lives at byte offset
# 16 + fi*frame_size and must be a 24-bit BI_RGB BMP whose declared pixel
# data fits its fixed-size slot.
_ZF = f"(16 + fi * {_le32('12')})"
_ZF_W = _sle32(f"{_ZF} + 18")
_ZF_H = _sle32(f"{_ZF} + 22")
# the frame-loop bound is self-guarded (0 unless the container checks
# already passed): DuckDB decorrelates the EXISTS and evaluates it for
# EVERY row, including non-ZVID/corrupt ones whose bytes 4..15 are
# garbage — an unguarded range() would be astronomically long there
_ZF_N = (
    f"(CASE WHEN is_zvid AND n_bytes >= 16 AND {_le32('4')} >= 1 "
    f"AND {_le32('12')} >= 54 AND {_le32('8')} >= 1 "
    f"AND 16 + {_le32('4')} * {_le32('12')} <= n_bytes "
    f"THEN {_le32('4')} ELSE 0 END)"
)
_ZVID_BAD_FRAME = f"""EXISTS (
        SELECT 1 FROM unnest(range({_ZF_N})) AS _zf(fi)
        WHERE NOT (substr(hx, CAST(2 * {_ZF} + 1 AS INT), 4) = '424D'
               AND {_le16(f'{_ZF} + 26')} = 1 AND {_le16(f'{_ZF} + 28')} = 24
               AND {_le32(f'{_ZF} + 30')} = 0
               AND {_ZF_W} > 0 AND {_ZF_H} > 0
               AND {_le32(f'{_ZF} + 10')} + ((3 * {_ZF_W} + 3) // 4 * 4) * {_ZF_H}
                   <= {_le32('12')})
      )"""

# The ordered classification CASE (shared by every media-verdict oracle;
# mirrors media_codecs.classify_payload check-for-check). Expects columns
# is_zvid / is_bmp / is_riff / n_bytes / hx in scope.
_CLASSIFY_CASE = f"""CASE
      WHEN NOT (is_zvid OR is_bmp OR is_riff) THEN 'bad_magic'
      WHEN is_zvid AND n_bytes < 16 THEN 'truncated'
      WHEN is_zvid AND ({_le32('4')} < 1 OR {_le32('12')} < 54 OR {_le32('8')} < 1)
        THEN 'unsupported_variant'
      WHEN is_zvid AND 16 + {_le32('4')} * {_le32('12')} > n_bytes THEN 'truncated'
      WHEN is_zvid AND {_ZVID_BAD_FRAME} THEN 'unsupported_variant'
      WHEN is_bmp AND n_bytes < 54 THEN 'truncated'
      WHEN is_bmp AND NOT ({_le16('26')} = 1 AND {_le16('28')} = 24 AND {_le32('30')} = 0
                           AND {_sle32('18')} > 0 AND {_sle32('22')} > 0)
        THEN 'unsupported_variant'
      WHEN is_bmp AND {_le32('10')}
             + ((3 * {_sle32('18')} + 3) // 4 * 4) * {_sle32('22')} > n_bytes
        THEN 'truncated'
      WHEN is_riff AND n_bytes < 44 THEN 'truncated'
      WHEN is_riff AND substr(hx, 17, 8) <> '57415645' THEN 'bad_magic'
      WHEN is_riff AND NOT ({_le16('20')} = 1 AND {_le16('22')} = 1 AND {_le16('34')} = 16
                            AND substr(hx, 73, 8) = '64617461')
        THEN 'unsupported_variant'
      WHEN is_riff AND ({_le32('40')} % 2) = 1 THEN 'unsupported_variant'
      WHEN is_riff AND 44 + {_le32('40')} > n_bytes THEN 'truncated'
      ELSE NULL
    END"""

_PARSED_COLS = """CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
         (substr(hx, 1, 8) = '5A564944') AS is_zvid,
         (substr(hx, 1, 8) <> '5A564944' AND substr(hx, 1, 4) = '424D') AS is_bmp,
         (substr(hx, 1, 8) = '52494646') AS is_riff"""


# ---------------------------------------------------------------------------
# media_payload_report — decode stats + byte-exact resize oracle
# ---------------------------------------------------------------------------

_REPORT_SQL = f"""WITH pay AS (
  SELECT media_ref, media_kind, meta, hex(payload) AS hx,
         CAST(octet_length(payload) AS BIGINT) AS n_bytes
  FROM read_parquet('{_W}/media_payloads/*.parquet')
),
img AS (
  SELECT media_ref, n_bytes, hx, meta,
         {_le32('18')} AS w, {_le32('22')} AS h
  FROM pay WHERE media_kind = 'image'
),
imgt AS (
  SELECT *, (3 * w + 3) // 4 * 4 AS rowsize,
         CASE WHEN greatest(w, h) > {_MAX_SIDE}
              THEN greatest((w * {_MAX_SIDE}) // greatest(w, h), 1) ELSE w END AS tw,
         CASE WHEN greatest(w, h) > {_MAX_SIDE}
              THEN greatest((h * {_MAX_SIDE}) // greatest(w, h), 1) ELSE h END AS th
  FROM img
),
imgt2 AS (SELECT *, (3 * tw + 3) // 4 * 4 AS rowsize_t FROM imgt),
pixmean AS (
  SELECT media_ref, avg({_byte('54 + (j // (3*w)) * rowsize + (j % (3*w))')}) AS content_mean
  FROM imgt2, unnest(range(imgt2.h * imgt2.w * 3)) AS u(j)
  GROUP BY media_ref
),
rrow AS (
  SELECT media_ref, rj,
         string_agg(
           substr(hx,
                  CAST(1 + 2 * (54 + (h - 1 - ((th - 1 - rj) * h) // th) * rowsize
                                + 3 * ((x * w) // tw)) AS INT),
                  6),
           '' ORDER BY x)
         || repeat('00', rowsize_t - 3 * tw) AS row_hex
  FROM imgt2, unnest(range(imgt2.th)) AS a(rj), unnest(range(imgt2.tw)) AS b(x)
  GROUP BY media_ref, rj, h, th, rowsize, rowsize_t, tw, w, hx
),
rbody AS (
  SELECT media_ref, string_agg(row_hex, '' ORDER BY rj) AS body
  FROM rrow GROUP BY media_ref
),
rsha AS (
  SELECT i.media_ref,
         sha256('424D' || {_le32hex('54 + i.rowsize_t * i.th')} || '00000000' || '36000000'
                || '28000000' || {_le32hex('i.tw')} || {_le32hex('i.th')} || '0100' || '1800'
                || '00000000' || {_le32hex('i.rowsize_t * i.th')}
                || '00000000' || '00000000' || '00000000' || '00000000'
                || b.body) AS resized_sha
  FROM imgt2 i JOIN rbody b USING (media_ref)
),
aud AS (
  SELECT media_ref, n_bytes, hx, meta,
         {_le32('24')} AS sr, {_le32('40')} // 2 AS ns
  FROM pay WHERE media_kind = 'audio'
),
audmean AS (
  SELECT media_ref, avg(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS content_mean
  FROM (
    SELECT media_ref, {_le16('44 + 2*j')} AS v
    FROM aud, unnest(range(aud.ns)) AS u(j)
  )
  GROUP BY media_ref
),
vid AS (
  SELECT media_ref, n_bytes, hx, meta,
         {_le32('4')} AS nf, {_le32('8')} AS fms, {_le32('12')} AS fsz,
         {_le32('34')} AS w, {_le32('38')} AS h
  FROM pay WHERE media_kind = 'video'
),
vidd AS (SELECT *, (3 * w + 3) // 4 * 4 AS rowsize FROM vid),
vidmean AS (
  SELECT media_ref,
         avg({_byte('16 + (j // (h*w*3)) * fsz + 54 '
                    '+ ((j % (h*w*3)) // (3*w)) * rowsize + ((j % (h*w*3)) % (3*w))')})
           AS content_mean
  FROM vidd, unnest(range(vidd.nf * vidd.h * vidd.w * 3)) AS u(j)
  GROUP BY media_ref
)
SELECT i.media_ref, 'image' AS media_kind, i.n_bytes,
       CAST(i.w AS INT) AS decoded_a, CAST(i.h AS INT) AS decoded_b,
       round(p.content_mean, 4) AS content_mean,
       (i.w = struct_extract(i.meta, 'width')
        AND i.h = struct_extract(i.meta, 'height')) AS meta_ok,
       CAST(i.tw AS INT) AS resized_w, CAST(i.th AS INT) AS resized_h,
       r.resized_sha
FROM imgt2 i JOIN pixmean p USING (media_ref) JOIN rsha r USING (media_ref)
UNION ALL
SELECT a.media_ref, 'audio', a.n_bytes, CAST(a.sr AS INT), CAST(a.ns AS INT),
       round(m.content_mean, 4),
       (a.sr = struct_extract(a.meta, 'sample_rate')),
       CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS VARCHAR)
FROM aud a JOIN audmean m USING (media_ref)
UNION ALL
SELECT v.media_ref, 'video', v.n_bytes, CAST(v.w AS INT), CAST(v.h AS INT),
       round(m.content_mean, 4),
       (v.w = struct_extract(v.meta, 'width')
        AND v.h = struct_extract(v.meta, 'height')
        AND v.nf * v.fms = struct_extract(v.meta, 'duration_ms')),
       CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS VARCHAR)
FROM vidd v JOIN vidmean m USING (media_ref)"""


@register("media_payload_report", _REPORT_SQL)
def media_payload_report(spark, sf_dir):
    """Real-codec media report: decoded dims/rate + content mean from the
    actual BMP/WAV decoders, decode-vs-metadata check (M2 rule), and the
    sha256 of the ACTUAL resized BMP bytes — all re-derived independently
    by DuckDB from the same payload blobs (resize reproduced byte-for-byte
    in SQL)."""
    from zparse_spark.multimodal import extract_features, resize_images

    pay = _media_input(spark)
    feats = extract_features(pay).select("media_ref", "feature")
    resized = resize_images(pay, max_side=_MAX_SIDE).select(
        "media_ref",
        F.col("meta.width").alias("resized_w"),
        F.col("meta.height").alias("resized_h"),
        F.sha2(F.hex("payload"), 256).alias("resized_sha"),
    )
    a = F.col("feature")[0].cast("int")
    b = F.col("feature")[1].cast("int")
    is_img = F.col("media_kind") == "image"
    is_vid = F.col("media_kind") == "video"
    dims_ok = (a == F.col("meta.width")) & (b == F.col("meta.height"))
    vid_dur_ok = (
        (F.col("feature")[2] * F.col("feature")[4]).cast("long")
        == F.col("meta.duration_ms").cast("long")
    )
    return (
        pay.select(
            "media_ref",
            "media_kind",
            F.octet_length("payload").cast("long").alias("n_bytes"),
            "meta",
        )
        .join(feats, "media_ref")
        .join(resized, "media_ref", "left")
        .select(
            "media_ref",
            "media_kind",
            "n_bytes",
            a.alias("decoded_a"),
            b.alias("decoded_b"),
            F.round(F.col("feature")[3], 4).alias("content_mean"),
            F.when(is_img, dims_ok)
            .when(is_vid, dims_ok & vid_dur_ok)
            .otherwise(a == F.col("meta.sample_rate"))
            .alias("meta_ok"),
            "resized_w",
            "resized_h",
            "resized_sha",
        )
    )


# ---------------------------------------------------------------------------
# media_decode_verdicts — typed error classification on corrupted payloads
# ---------------------------------------------------------------------------

_VERDICT_SQL = f"""WITH pay0 AS (
  SELECT media_ref, media_kind, hex(payload) AS hx0,
         CAST(substr(media_ref, 7) AS INT) AS i
  FROM read_parquet('{_W}/media_payloads/*.parquet')
),
pay AS (
  SELECT media_ref, media_kind,
         CASE
           WHEN i % 8 IN (1, 2) THEN substr(hx0, 1, 40)
           WHEN i % 8 IN (3, 4) THEN '5858' || substr(hx0, 5)
           WHEN i % 8 IN (5, 6) AND media_kind = 'video'
             THEN substr(hx0, 1, 8) || '00000000' || substr(hx0, 17)
           WHEN i % 8 IN (5, 6) AND media_kind = 'image'
             THEN substr(hx0, 1, 56) || '2000' || substr(hx0, 61)
           WHEN i % 8 IN (5, 6)
             THEN substr(hx0, 1, 44) || '0200' || substr(hx0, 49)
           ELSE hx0
         END AS hx
  FROM pay0
),
parsed AS (
  SELECT media_ref, media_kind, hx,
         CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
         (substr(hx, 1, 8) = '5A564944') AS is_zvid,
         (substr(hx, 1, 8) <> '5A564944' AND substr(hx, 1, 4) = '424D') AS is_bmp,
         (substr(hx, 1, 8) = '52494646') AS is_riff
  FROM pay
)
SELECT media_ref, media_kind, n_bytes, (error_kind IS NULL) AS ok, error_kind
FROM (
  SELECT media_ref, media_kind, n_bytes,
{_CLASSIFY_CASE} AS error_kind
  FROM parsed
)"""


@register("media_decode_verdicts", _VERDICT_SQL)
def media_decode_verdicts(spark, sf_dir):
    """M1 rule on deliberately corrupted payloads: deterministic hex-level
    corruptions (truncation, magic overwrite, unsupported bpp/channels)
    are planted identically in both engines; Spark classifies via the
    real header parser (``classify_payload``), DuckDB via the same
    ordered checks as a SQL CASE over the hex — the typed error rows
    must agree exactly."""
    from zparse_spark.multimodal import decode_verdicts

    pay = _media_input(spark)
    p0 = pay.select(
        "media_ref",
        "media_kind",
        F.hex("payload").alias("hx0"),
        F.substring("media_ref", 7, 10).cast("int").alias("i"),
    )
    m8 = F.col("i") % 8
    tail = 1 << 30
    hx = (
        F.when(m8.isin(1, 2), F.substring("hx0", 1, 40))
        .when(m8.isin(3, 4), F.concat(F.lit("5858"), F.substring("hx0", 5, tail)))
        .when(
            m8.isin(5, 6) & (F.col("media_kind") == "video"),
            F.concat(F.substring("hx0", 1, 8), F.lit("00000000"), F.substring("hx0", 17, tail)),
        )
        .when(
            m8.isin(5, 6) & (F.col("media_kind") == "image"),
            F.concat(F.substring("hx0", 1, 56), F.lit("2000"), F.substring("hx0", 61, tail)),
        )
        .when(
            m8.isin(5, 6),
            F.concat(F.substring("hx0", 1, 44), F.lit("0200"), F.substring("hx0", 49, tail)),
        )
        .otherwise(F.col("hx0"))
    )
    corrupted = p0.select(
        "media_ref", "media_kind", F.to_binary(hx, F.lit("hex")).alias("payload")
    )
    return decode_verdicts(corrupted)


# ---------------------------------------------------------------------------
# media_video_frames — real frame sampling, frame bytes fingerprinted
# ---------------------------------------------------------------------------

_EVERY_MS = 150

_FRAMES_SQL = f"""WITH pay AS (
  SELECT media_ref, meta, hex(payload) AS hx
  FROM read_parquet('{_W}/media_payloads/*.parquet')
  WHERE media_kind = 'video'
),
vid AS (
  SELECT media_ref, hx,
         {_le32('4')} AS nf, {_le32('8')} AS fms, {_le32('12')} AS fsz,
         greatest(CAST(struct_extract(meta, 'duration_ms') // {_EVERY_MS} AS INT), 1) AS n_samples
  FROM pay
),
grid AS (
  SELECT media_ref, hx, nf, fms, fsz,
         CAST(i * {_EVERY_MS} AS BIGINT) AS ts_ms,
         CAST(least((i * {_EVERY_MS}) // fms, nf - 1) AS INT) AS frame_idx
  FROM vid, unnest(range(vid.n_samples)) AS u(i)
)
SELECT media_ref, ts_ms, frame_idx,
       sha256(substr(hx, CAST(1 + 2 * (16 + frame_idx * fsz) AS INT), CAST(2 * fsz AS INT)))
         AS frame_sha
FROM grid"""


@register("media_video_frames", _FRAMES_SQL)
def media_video_frames(spark, sf_dir):
    """Real ZVID frame sampling: the JVM plans the ts grid from declared
    duration, Python slices exactly the sampled frames (O(1) byte range
    per frame — skipped frames are never read), and DuckDB re-derives
    every sampled frame's sha256 fingerprint from the container header
    arithmetic over the same blobs."""
    from zparse_spark.multimodal import sample_video_frames

    pay = _media_input(spark)
    return sample_video_frames(pay, every_ms=_EVERY_MS)


# ---------------------------------------------------------------------------
# span_pack_media_rule — M1 joined into the engine's rule pack
# ---------------------------------------------------------------------------

_PACK_W = _W  # same oracle warehouse as queries_span


def _pack_media_input(spark):
    """The span-pack fixture corpus plus a REAL payload table for its
    media-ref keyspace, with planted decode failures: every ref whose id
    ≡ 7 (mod 16) is truncated to 20 bytes, every id ≡ 11 (mod 16) is
    DROPPED (referenced-but-absent). Corruption happens before the
    write, so the oracle reads the corrupted bytes — it only needs to
    classify, not reproduce the corruption."""
    from zparse_spark.multimodal import synthesize_codec_payloads
    from zparse_spark.queries_span import _pack_input

    docs, _ = _pack_input(spark)
    pay = synthesize_codec_payloads(spark, n_media=512)
    i = F.substring("media_ref", 7, 10).cast("int")
    hx = F.when(i % 16 == 7, F.substring(F.hex("payload"), 1, 40)).otherwise(
        F.hex("payload")
    )
    corrupted = (
        pay.filter(i % 16 != 11)
        .select(
            "media_ref",
            "media_kind",
            F.to_binary(hx, F.lit("hex")).alias("payload"),
        )
    )
    corrupted.write.mode("overwrite").parquet(f"{_PACK_W}/media_for_pack")
    return docs, spark.read.parquet(f"{_PACK_W}/media_for_pack")


_M1_SQL = f"""WITH docs AS (
  SELECT doc_id, spans, partition FROM read_parquet('{_PACK_W}/span_docs/*.parquet')
),
pay AS (
  SELECT media_ref, hex(payload) AS hx
  FROM read_parquet('{_PACK_W}/media_for_pack/*.parquet')
),
parsed AS (
  SELECT media_ref, hx,
         {_PARSED_COLS}
  FROM pay
),
bad AS (
  SELECT media_ref, error_kind FROM (
    SELECT media_ref, {_CLASSIFY_CASE} AS error_kind FROM parsed
  ) WHERE error_kind IS NOT NULL
),
refs AS (
  SELECT partition, doc_id, CAST(pos - 1 AS INT) AS span_pos,
         CAST(s."offset" AS BIGINT) AS off, s.media_ref AS media_ref
  FROM (
    SELECT partition, doc_id, unnest(spans) AS s,
           generate_subscripts(spans, 1) AS pos
    FROM docs
  ) WHERE s.media_ref IS NOT NULL
),
badall AS (
  SELECT media_ref, error_kind FROM bad
  UNION ALL
  SELECT DISTINCT r.media_ref, 'missing' FROM refs r
  WHERE r.media_ref NOT IN (SELECT media_ref FROM pay)
)
SELECT r.partition, r.doc_id, 'M1' AS rule_id, 'MediaDecodeFailed' AS kind,
       r.span_pos, r.off AS "offset",
       CAST(NULL AS INT) AS line, CAST(NULL AS INT) AS "col",
       'media payload ' || b.error_kind || ': ' || r.media_ref AS message
FROM refs r JOIN badall b USING (media_ref)"""


@register("span_pack_media_rule", _M1_SQL)
def span_pack_media_rule(spark, sf_dir):
    """M1 over the interleaved fixture corpus: referenced payloads that
    are truncated or absent yield one violation row per referencing
    span, emitted by the ENGINE (enable_media_decode) with
    decode_verdicts classifying each payload once — DuckDB re-derives
    the same rows by classifying the corrupted blobs and joining the
    UNNESTed span refs."""
    from zparse_spark.multimodal import decode_verdicts
    from zparse_spark.plans.engine import ValidationConfig, ValidationEngine
    from zparse_spark.queries_span import _PARAMS

    docs, pay = _pack_media_input(spark)
    eng = ValidationEngine(
        ValidationConfig(
            params=_PARAMS,
            enable_uniqueness=False,
            enable_referential=False,
            enable_drift=False,
            enable_media_decode=True,
        )
    )
    viol = eng.violations(docs, media_verdicts=decode_verdicts(pay))
    return viol.filter(F.col("rule_id") == "M1")


# ---------------------------------------------------------------------------
# Payload-level content dedup: identical bytes under multiple refs
# ---------------------------------------------------------------------------

_PAYLOAD_DEDUP_SQL = f"""WITH pay AS (
  SELECT media_ref, media_kind, hex(payload) AS hx, octet_length(payload) AS nb
  FROM read_parquet('{_W}/media_payloads/*.parquet')
),
planted AS (
  SELECT media_ref, media_kind, hx, nb FROM pay
  UNION ALL
  SELECT 'dup_' || media_ref, media_kind, hx, nb
  FROM pay WHERE substr(media_ref, length(media_ref), 1) = '0'
),
grouped AS (
  SELECT sha256(hx) AS content_sha, media_kind,
         count(*) AS n_refs,
         min(nb) AS n_bytes,
         string_agg(media_ref, ',' ORDER BY media_ref) AS refs
  FROM planted GROUP BY 1, 2
)
SELECT content_sha, media_kind, n_refs, CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST((n_refs - 1) * n_bytes AS BIGINT) AS reclaimable_bytes,
       refs
FROM grouped WHERE n_refs > 1"""


@register("media_payload_dedup", _PAYLOAD_DEDUP_SQL)
def media_payload_dedup(spark, sf_dir):
    """Payload-level content dedup across the media catalog: identical
    payload BYTES stored under different media_refs (re-uploads, crawl
    mirrors) found by one groupBy on the content hash — the binary-
    modality twin of dedup_exact_documents, and the storage-reclaim
    number an Iceberg rewrite would bank ((n_refs−1)·bytes per group).
    Duplicates are planted deterministically (every ref ending in '0'
    re-keyed under dup_*) in BOTH engines from the same persisted
    payload parquet; the hash is sha256 over the HEX of the exact
    bytes (the established portable-hash trick), so a green row
    certifies byte-level grouping, not metadata matching. Scale shape:
    map-side hash per payload, one shuffle of (hash, ref) pairs — no
    payload bytes move after the map stage at 10^12 docs (project the
    hash FIRST, shuffle 32-byte digests, never blobs)."""
    pay = _media_input(spark).select(
        "media_ref",
        "media_kind",
        F.sha2(F.hex("payload"), 256).alias("content_sha"),
        F.octet_length("payload").cast("long").alias("nb"),
    )
    dups = pay.filter(F.col("media_ref").endswith("0")).withColumn(
        "media_ref", F.concat(F.lit("dup_"), F.col("media_ref"))
    )
    planted = pay.unionByName(dups)
    return (
        planted.groupBy("content_sha", "media_kind")
        .agg(
            F.count(F.lit(1)).alias("n_refs"),
            F.min("nb").alias("n_bytes"),
            F.array_join(F.array_sort(F.collect_list("media_ref")), ",").alias("refs"),
        )
        .filter(F.col("n_refs") > 1)
        .select(
            "content_sha",
            "media_kind",
            "n_refs",
            "n_bytes",
            ((F.col("n_refs") - 1) * F.col("n_bytes")).alias("reclaimable_bytes"),
            "refs",
        )
    )


# ---------------------------------------------------------------------------
# Perceptual dHash image near-dup (X229)
# ---------------------------------------------------------------------------


def _dhash_bits(byte_fn, idiv: str) -> str:
    """Shared 8x8 dHash structure, parameterized only by the engine's
    hex-byte extractor and integer-division token: luminance (exact
    r+g+b integer sum, no division) point-sampled on a 9x8 grid
    (x_i = i*w//9, y_j = j*h//8, bottom-up BMP row addressing), each
    bit = right neighbor brighter, emitted as a 64-char '0'/'1'
    string (portable: no sign games with 64-bit packing)."""

    def lum(i: int, j: int) -> str:
        po = (
            f"(off + (h - 1 - (({j})*h {idiv} 8)) * stride"
            f" + 3*(({i})*w {idiv} 9))"
        )
        return (
            f"({byte_fn(po)} + {byte_fn(f'({po})+1')} + {byte_fn(f'({po})+2')})"
        )

    bits = []
    for j in range(8):
        for i in range(8):
            bits.append(
                f"(CASE WHEN {lum(i + 1, j)} > {lum(i, j)} THEN '1' ELSE '0' END)"
            )
    return "(" + " || ".join(bits) + ")"


def _dhash_oracle_sql() -> str:
    valid = (
        f"{_le16('26')} = 1 AND {_le16('28')} = 24 AND {_le32('30')} = 0"
    )
    tweak_pos = "(2 * (off + (h - 2) * stride) + 1)"
    return f"""
    WITH base AS (
      SELECT media_ref, hex(payload) AS hx
      FROM read_parquet('{_W}/media_payloads/*.parquet')
    ),
    bmp AS (
      SELECT media_ref, hx FROM base
      WHERE substr(hx, 1, 4) = '424D' AND substr(hx, 1, 8) <> '5A564944'
        AND length(hx) // 2 >= 54 AND {valid}
    ),
    dims AS (
      SELECT media_ref, hx, {_le32('18')} AS w, {_le32('22')} AS h,
             {_le32('10')} AS off
      FROM bmp
    ),
    d2 AS (
      SELECT media_ref, hx, w, h, off, ((3 * w + 3) // 4) * 4 AS stride
      FROM dims
      WHERE w > 0 AND h > 0
        AND off + ((3 * w + 3) // 4) * 4 * h <= length(hx) // 2
    ),
    tweak AS (
      SELECT 'tweak_' || media_ref AS media_ref,
             substr(hx, 1, {tweak_pos} - 1)
               || (CASE WHEN substr(hx, {tweak_pos}, 2) = 'FF'
                        THEN '00' ELSE 'FF' END)
               || substr(hx, {tweak_pos} + 2) AS hx,
             w, h, off, stride
      FROM d2 WHERE h = 16
    ),
    allp AS (SELECT * FROM d2 UNION ALL SELECT * FROM tweak),
    hashes AS (
      SELECT media_ref, {_dhash_bits(_byte, '//')} AS dhash FROM allp
    )
    SELECT dhash, count(*) AS n_payloads,
           array_to_string(list_sort(list(media_ref)), ',') AS refs
    FROM hashes GROUP BY dhash HAVING count(*) > 1
    """


@register("media_dhash_near_dup", _dhash_oracle_sql())
def media_dhash_near_dup(spark, sf_dir):
    """Perceptual dHash image near-dup (X229): byte-DIFFERENT payloads
    with the same 8x8 gradient hash — the multimodal twin of text
    near-dup that X178's byte-exact grouping structurally misses
    (re-encoded/retouched copies of the same image). Planted: every
    h=16 BMP gets a 'tweak_' twin with one pixel byte flipped in an
    UNSAMPLED row (point sampling makes it provably hash-invisible),
    so each must land in its original's group while its sha differs.
    The ENTIRE pipeline is hex-string integer arithmetic generated
    from ONE shared structure (_dhash_bits) for both engines — Spark
    runs it as whole-stage-codegen expressions (conv/substring), DuckDB
    via the ascii-nibble extractor; no Python, no codec library, no
    explode. At 100 TB the hash is one map-only projection and the
    grouping shuffles 64-char keys."""
    from pyspark.sql import functions as F

    def sp_byte(o: str) -> str:
        return (
            f"(CAST(conv(substring(hx, CAST(2*({o})+1 AS INT), 2), 16, 10)"
            f" AS BIGINT))"
        )

    def sp_le16(o: str) -> str:
        return f"({sp_byte(o)} + 256 * {sp_byte(f'({o})+1')})"

    def sp_le32(o: str) -> str:
        return (
            f"({sp_byte(o)} + 256 * {sp_byte(f'({o})+1')} "
            f"+ 65536 * {sp_byte(f'({o})+2')} + 16777216 * {sp_byte(f'({o})+3')})"
        )

    base = _media_input(spark).select(
        "media_ref", F.hex("payload").alias("hx")
    )
    bmp = base.filter(
        (F.expr("substring(hx, 1, 4)") == "424D")
        & (F.expr("substring(hx, 1, 8)") != "5A564944")
        & (F.length("hx") / 2 >= 54)
        & F.expr(
            f"{sp_le16('26')} = 1 AND {sp_le16('28')} = 24 AND {sp_le32('30')} = 0"
        )
    )
    dims = bmp.select(
        "media_ref",
        "hx",
        F.expr(sp_le32("18")).alias("w"),
        F.expr(sp_le32("22")).alias("h"),
        F.expr(sp_le32("10")).alias("off"),
    )
    d2 = dims.withColumn(
        "stride", F.expr("((3 * w + 3) div 4) * 4")
    ).filter(
        (F.col("w") > 0)
        & (F.col("h") > 0)
        & F.expr("off + stride * h <= length(hx) div 2")
    )
    tweak_pos = "(2 * (off + (h - 2) * stride) + 1)"
    tweak = d2.filter(F.col("h") == 16).select(
        F.concat(F.lit("tweak_"), F.col("media_ref")).alias("media_ref"),
        F.expr(
            f"concat(substring(hx, 1, {tweak_pos} - 1), "
            f"CASE WHEN substring(hx, {tweak_pos}, 2) = 'FF' THEN '00' ELSE 'FF' END, "
            f"substring(hx, {tweak_pos} + 2))"
        ).alias("hx"),
        "w", "h", "off", "stride",
    )
    allp = d2.unionByName(tweak)
    hashes = allp.select(
        "media_ref", F.expr(_dhash_bits(sp_byte, "div")).alias("dhash")
    )
    return (
        hashes.groupBy("dhash")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.array_join(F.array_sort(F.collect_list("media_ref")), ",").alias(
                "refs"
            ),
        )
        .filter(F.col("n_payloads") > 1)
    )


# ---------------------------------------------------------------------------
# Audio amplitude-contour perceptual hash (X230)
# ---------------------------------------------------------------------------


def _contour_bits(byte_fn, idiv: str) -> str:
    """Shared 16-bit amplitude-contour structure (the WAV twin of
    _dhash_bits): |sample| point-sampled at 17 positions
    (pos_s = s*n IDIV 17, byte offset 44 + 2*pos), each bit = next
    sampled amplitude strictly louder; signed 16-bit LE decode and
    abs() in exact integer arithmetic, emitted as a 16-char '0'/'1'
    string."""

    def amp(s: int) -> str:
        off = f"(44 + 2 * (({s}) * n {idiv} 17))"
        raw = f"({byte_fn(off)} + 256 * {byte_fn(f'({off})+1')})"
        signed = f"(CASE WHEN {raw} >= 32768 THEN {raw} - 65536 ELSE {raw} END)"
        return f"(abs({signed}))"

    bits = []
    for s in range(16):
        bits.append(
            f"(CASE WHEN {amp(s + 1)} > {amp(s)} THEN '1' ELSE '0' END)"
        )
    return "(" + " || ".join(bits) + ")"


def _contour_oracle_sql() -> str:
    return f"""
    WITH base AS (
      SELECT media_ref, hex(payload) AS hx
      FROM read_parquet('{_W}/media_payloads/*.parquet')
    ),
    wav AS (
      SELECT media_ref, hx, ({_le32('40')}) // 2 AS n
      FROM base
      WHERE substr(hx, 1, 8) = '52494646' AND length(hx) // 2 >= 44
        AND substr(hx, 17, 8) = '57415645'
        AND {_le16('20')} = 1 AND {_le16('22')} = 1 AND {_le16('34')} = 16
        AND 44 + {_le32('40')} <= length(hx) // 2
        AND ({_le32('40')}) // 2 >= 34
    ),
    tweak AS (
      SELECT 'tweak_' || media_ref AS media_ref,
             substr(hx, 1, 92)
               || (CASE WHEN substr(hx, 93, 2) = 'FF' THEN '00' ELSE 'FF' END)
               || substr(hx, 95) AS hx,
             n
      FROM wav
    ),
    allp AS (SELECT * FROM wav UNION ALL SELECT * FROM tweak),
    hashes AS (
      SELECT media_ref, {_contour_bits(_byte, '//')} AS contour FROM allp
    )
    SELECT contour, count(*) AS n_payloads,
           array_to_string(list_sort(list(media_ref)), ',') AS refs
    FROM hashes GROUP BY contour HAVING count(*) > 1
    """


@register("media_contour_near_dup", _contour_oracle_sql())
def media_contour_near_dup(spark, sf_dir):
    """Audio amplitude-contour near-dup (X230): the WAV twin of the
    X229 image dHash — byte-different payloads whose 16-step loudness
    contour matches (re-encoded/volume-tweaked copies of the same
    clip). Planted: every valid WAV gets a 'tweak_' twin with sample
    index 1 flipped — index 1 is provably unsampled for n >= 34 (the
    17-point grid starts at 0 and jumps to n//17 >= 2), so the twin is
    hash-invisible while its sha differs. Same shared-structure
    discipline as X229: ONE generator emits both engines' integer
    expressions (incl. the signed 16-bit decode); map-only at scale."""
    from pyspark.sql import functions as F

    def sp_byte(o: str) -> str:
        return (
            f"(CAST(conv(substring(hx, CAST(2*({o})+1 AS INT), 2), 16, 10)"
            f" AS BIGINT))"
        )

    def sp_le16(o: str) -> str:
        return f"({sp_byte(o)} + 256 * {sp_byte(f'({o})+1')})"

    def sp_le32(o: str) -> str:
        return (
            f"({sp_byte(o)} + 256 * {sp_byte(f'({o})+1')} "
            f"+ 65536 * {sp_byte(f'({o})+2')} + 16777216 * {sp_byte(f'({o})+3')})"
        )

    base = _media_input(spark).select("media_ref", F.hex("payload").alias("hx"))
    wav = base.filter(
        (F.expr("substring(hx, 1, 8)") == "52494646")
        & F.expr("length(hx) div 2 >= 44")
        & (F.expr("substring(hx, 17, 8)") == "57415645")
        & F.expr(
            f"{sp_le16('20')} = 1 AND {sp_le16('22')} = 1 AND {sp_le16('34')} = 16"
        )
        & F.expr(f"44 + {sp_le32('40')} <= length(hx) div 2")
        & F.expr(f"({sp_le32('40')}) div 2 >= 34")
    ).select(
        "media_ref", "hx", F.expr(f"({sp_le32('40')}) div 2").alias("n")
    )
    tweak = wav.select(
        F.concat(F.lit("tweak_"), F.col("media_ref")).alias("media_ref"),
        F.expr(
            "concat(substring(hx, 1, 92), "
            "CASE WHEN substring(hx, 93, 2) = 'FF' THEN '00' ELSE 'FF' END, "
            "substring(hx, 95))"
        ).alias("hx"),
        "n",
    )
    allp = wav.unionByName(tweak)
    hashes = allp.select(
        "media_ref", F.expr(_contour_bits(sp_byte, "div")).alias("contour")
    )
    return (
        hashes.groupBy("contour")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.array_join(F.array_sort(F.collect_list("media_ref")), ",").alias("refs"),
        )
        .filter(F.col("n_payloads") > 1)
    )
