"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side architecture is real and tested — schema contracts,
partition-parallel batch iteration, struct metadata. The codec step
decodes trivial containers with the pure-numpy codecs in this package
— netpbm P5/P6 and uncompressed 24-bit BMP (``raster.py``), PCM-16
RIFF/WAVE (``wav.py``), and uncompressed 24-bit DIB AVI (``avi.py``)
— so all three modalities run end-to-end on real encoded bytes —
while formats needing an external library (JPEG/PNG/MP3/H.264/...)
stay an explicit stub: the ``decode_*`` dispatchers raise
NotImplementedError unless handed a decoder through the injection
API.

At 100 TB: binaries live in parquet (or are lazily fetched by URI
inside the batch iterator to keep shuffle payloads small); decode and
feature-extraction parallelize per input partition with zero shuffle;
only the (tiny) extracted features flow downstream.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# Output schema contract of the image feature extractor.
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, n_bytes long, mean_lum double, "
    "phash long"
)


def attach_binary_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: derive a deterministic binary payload + metadata
    struct from a text column, standing in for real image bytes."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(text_col).alias("orig_size"),
        ).alias("media_meta"),
    )


def fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image codec: expands bytes into a
    small pseudo-image (h, w) uint8 array derived from content."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    h = 8 + int(arr[:4].sum()) % 8
    w = 8 + int(arr[4:8].sum() if len(arr) >= 8 else 0) % 8
    tiled = np.resize(arr, (h, w))
    return tiled


def decode_image(payload: bytes, decoder: Callable | None = None) -> np.ndarray:
    """Codec boundary. Real deployments pass Pillow/libvips/ffmpeg here.
    Without an injected decoder, trivial raster containers (binary
    netpbm P5/P6 and uncompressed 24-bit BMP) decode through the
    pure-numpy codecs in ``raster.py`` — so those run end-to-end on
    real bytes — while anything needing an external library stays an
    explicit stub."""
    if decoder is not None:
        return decoder(payload)
    from direct_kafka_stream_spark.functions import raster

    if raster.sniff(bytes(payload[:64])) is not None:
        return raster.decode_raster(payload)
    raise NotImplementedError(
        "no codec for this container in this environment; inject a decoder"
    )


def ahash64(img: np.ndarray) -> int:
    """64-bit average-hash fingerprint: resize to the 8x8 grid
    (row-major ``np.resize`` tiling), threshold at the mean, fold the
    bit vector into a signed long. ONE definition shared by image
    features and video frame sampling — the near-dup key must be
    computed identically across modalities or image-vs-frame dedup
    silently diverges."""
    flat = np.resize(np.asarray(img, dtype=np.float64), (8, 8))
    bits = (flat > flat.mean()).flatten()
    phash = int(sum(int(b) << i for i, b in enumerate(bits)))
    # keep phash in signed-long range
    if phash >= 1 << 63:
        phash -= 1 << 64
    return phash


def image_features(
    df: DataFrame, decoder: Callable | None = None
) -> DataFrame:
    """mapInPandas feature extraction over binary media: per Arrow
    batch, decode each payload and emit fixed-width features (dims,
    luminance, a 64-bit perceptual-hash-shaped fingerprint). The only
    Python-side stage in the pipeline; everything downstream is
    DataFrame algebra again."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                img = decode_image(bytes(payload), decoder)
                phash = ahash64(img)
                rows.append(
                    (
                        int(doc_id),
                        int(img.shape[1]),
                        int(img.shape[0]),
                        int(len(payload)),
                        float(img.mean()),
                        phash,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes", "mean_lum", "phash"],
            )

    return df.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Video-style frame sampling shape: given (doc_id, media) where the
    payload notionally contains N frames, emit every nth frame index
    with its byte-slice bounds — pure DataFrame ops (no decode), showing
    that sampling/slicing logic stays JVM-side even for binary media."""
    n_frames = (F.length("media") / 16).cast("int").alias("n_frames")
    with_frames = df.select("doc_id", F.col("media"), n_frames)
    idx = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_nth))
    ).alias("frame_idx")
    return with_frames.select("doc_id", "n_frames", idx).select(
        "doc_id",
        "frame_idx",
        (F.col("frame_idx") * 16).alias("byte_start"),
        (F.col("frame_idx") * 16 + 16).alias("byte_end"),
    )


RESIZED_SCHEMA = "doc_id long, out_h int, out_w int, mean_lum double"


def pool_mean(img: np.ndarray, out_h: int, out_w: int) -> float:
    """Area-average pooling onto the (out_h, out_w) grid: buckets are
    the exact, non-overlapping [ys[i], ys[i+1]) tiles (empty when
    h < out_h), and the pooled mean weights each bucket by its pixel
    count — the tiles PARTITION the image, so the pooled mean equals
    the global mean EXACTLY for any (h, w, grid) (uint8 sums are exact
    integers in float64; property-pinned in tests/test_multimodal.py)."""
    h, w = img.shape
    ys = np.linspace(0, h, out_h + 1).astype(int)
    xs = np.linspace(0, w, out_w + 1).astype(int)
    total = 0.0
    npx = 0
    for i in range(out_h):
        for j in range(out_w):
            blk = img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            total += float(blk.sum())
            npx += blk.size
    return total / npx if npx else 0.0


def resize_images(
    df: DataFrame,
    out_h: int = 4,
    out_w: int = 4,
    decoder: Callable | None = None,
) -> DataFrame:
    """mapInPandas resize stage: decode each payload, area-average down
    to a fixed (out_h, out_w) grid, emit the resized luminance summary
    — the standardize-before-embed step of an image training pipeline.
    Same architecture contract as image_features: Arrow-batched, zero
    shuffle (partition-parallel), only fixed-width outputs flow
    downstream; the codec is the raster sniffer unless injected."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                img = decode_image(bytes(payload), decoder).astype(np.float64)
                rows.append(
                    (int(doc_id), out_h, out_w, pool_mean(img, out_h, out_w))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_h", "out_w", "mean_lum"]
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


def decode_audio(
    payload: bytes, decoder: Callable | None = None
) -> tuple[int, np.ndarray]:
    """Audio codec boundary, mirror of ``decode_image``: real
    deployments pass soundfile/ffmpeg here; without an injected
    decoder, PCM-16 RIFF/WAVE decodes through the pure-numpy codec in
    ``wav.py`` (so that path runs end-to-end on real bytes), and
    anything else stays an explicit stub. Returns ``(rate, samples)``
    with samples shaped (n_frames, channels) int16."""
    if decoder is not None:
        return decoder(payload)
    from direct_kafka_stream_spark.functions import wav

    if wav.sniff_wav(bytes(payload[:12])):
        return wav.decode_wav(payload)
    raise NotImplementedError(
        "no audio codec for this container in this environment; "
        "inject a decoder"
    )


AUDIO_WINDOW_SCHEMA = (
    "doc_id long, win_idx int, byte_start long, byte_end long, rms double"
)


def audio_windows(
    df: DataFrame,
    win_bytes: int = 32,
    hop_bytes: int = 16,
) -> DataFrame:
    """Audio-style sliding-window segmentation: treat the binary payload
    as a PCM-like sample stream and emit overlapping (win, hop) windows
    with their byte bounds JVM-side (pure DataFrame algebra — the
    sequence/explode plan frame_sample uses, generalized to overlap),
    then one Arrow pass computes per-window RMS over the byte slice —
    the feature-extraction shape of a speech pipeline (filterbanks
    would replace RMS; the windowing plan is identical). Window bounds
    never leave the JVM; only (doc, window) rows reach Python."""
    n = F.length("media").alias("n_bytes")
    wins = (
        df.select("doc_id", "media", n)
        .filter(F.col("n_bytes") >= win_bytes)
        .select(
            "doc_id",
            "media",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor((F.col("n_bytes") - win_bytes) / hop_bytes).cast(
                        "long"
                    ),
                    F.lit(1).cast("long"),
                )
            ).alias("win_idx"),
        )
        .select(
            "doc_id",
            F.col("win_idx").cast("int").alias("win_idx"),
            (F.col("win_idx") * hop_bytes).cast("long").alias("byte_start"),
            (F.col("win_idx") * hop_bytes + win_bytes)
            .cast("long")
            .alias("byte_end"),
            F.substring(
                F.col("media"), (F.col("win_idx") * hop_bytes + 1).cast("int"),
                win_bytes,
            ).alias("chunk"),
        )
    )

    def rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, win_idx, b0, b1, chunk in zip(
                pdf["doc_id"], pdf["win_idx"], pdf["byte_start"],
                pdf["byte_end"], pdf["chunk"],
            ):
                arr = np.frombuffer(bytes(chunk), dtype=np.uint8).astype(
                    np.float64
                )
                rows.append(
                    (
                        int(doc_id), int(win_idx), int(b0), int(b1),
                        float(np.sqrt((arr * arr).mean())) if len(arr) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "win_idx", "byte_start", "byte_end", "rms"],
            )

    return wins.mapInPandas(rms, schema=AUDIO_WINDOW_SCHEMA)


WAV_WINDOW_SCHEMA = (
    "doc_id long, win_idx int, rate int, channels int, "
    "start_frame long, end_frame long, rms double"
)


def audio_windows_wav(
    df: DataFrame,
    win_frames: int = 256,
    hop_frames: int = 128,
) -> DataFrame:
    """``audio_windows`` on REAL encoded audio: the payloads are actual
    RIFF/WAVE PCM-16 bytes (decoded by ``wav.py``, zero injected
    fakes), and the output RMS is over genuine int16 samples.

    Three-stage plan keeping the window PLANNING JVM-side, like the
    byte-window sibling:
      1. one Arrow pass parses each payload's RIFF HEADER ONLY
         (``wav.parse_header`` — chunk walk, no sample decode) and
         re-emits the row with (data_off, rate, channels, n_frames)
         metadata attached;
      2. pure DataFrame algebra computes the sliding (win, hop) frame
         grid — sequence/explode — and slices each window's exact byte
         range out of the payload with ``substring`` (frame f of a
         ch-channel PCM-16 stream lives at data_off + f*2*ch), so
         window bounds and slicing never leave the JVM and a window's
         shuffle payload is the window, not the file;
      3. a second Arrow pass reinterprets each slice as int16 frames
         (``np.frombuffer``) and computes channel-averaged RMS.

    At 100 TB this is the speech-pipeline pre-processing shape:
    header-parse is O(header), windows parallelize per input partition
    with zero shuffle, and only fixed-width (doc, window) features flow
    downstream. Docs whose stream is shorter than one window emit
    nothing (same contract as the byte-window form)."""
    meta_schema = (
        "doc_id long, media binary, data_off long, rate int, "
        "channels int, n_frames long"
    )

    def parse_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from direct_kafka_stream_spark.functions import wav

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                h = wav.parse_header(bytes(payload))
                rows.append(
                    (
                        int(doc_id), payload, int(h["data_off"]),
                        int(h["rate"]), int(h["channels"]), int(h["n_frames"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media", "data_off", "rate", "channels",
                    "n_frames",
                ],
            )

    with_meta = df.select("doc_id", "media").mapInPandas(
        parse_meta, schema=meta_schema
    )

    frame_bytes = F.col("channels").cast("long") * 2
    wins = (
        with_meta.filter(F.col("n_frames") >= win_frames)
        .select(
            "doc_id", "media", "data_off", "rate", "channels",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor(
                        (F.col("n_frames") - win_frames) / hop_frames
                    ).cast("long"),
                    F.lit(1).cast("long"),
                )
            ).alias("win_idx"),
        )
        .select(
            "doc_id",
            F.col("win_idx").cast("int").alias("win_idx"),
            F.col("rate"),
            F.col("channels"),
            (F.col("win_idx") * hop_frames).cast("long").alias("start_frame"),
            (F.col("win_idx") * hop_frames + win_frames)
            .cast("long")
            .alias("end_frame"),
            # substring is 1-based; frame f starts data_off + f*2*ch in
            F.substring(
                F.col("media"),
                (
                    F.col("data_off")
                    + F.col("win_idx") * hop_frames * frame_bytes
                    + 1
                ).cast("int"),
                (F.lit(win_frames) * frame_bytes).cast("int"),
            ).alias("chunk"),
        )
    )

    def rms16(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, win_idx, rate, ch, f0, f1, chunk in zip(
                pdf["doc_id"], pdf["win_idx"], pdf["rate"], pdf["channels"],
                pdf["start_frame"], pdf["end_frame"], pdf["chunk"],
            ):
                arr = np.frombuffer(bytes(chunk), dtype="<i2").astype(
                    np.float64
                )
                rows.append(
                    (
                        int(doc_id), int(win_idx), int(rate), int(ch),
                        int(f0), int(f1),
                        float(np.sqrt((arr * arr).mean())) if len(arr) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "win_idx", "rate", "channels",
                    "start_frame", "end_frame", "rms",
                ],
            )

    return wins.mapInPandas(rms16, schema=WAV_WINDOW_SCHEMA)


def decode_video(
    payload: bytes, decoder: Callable | None = None
) -> tuple[float, np.ndarray]:
    """Video codec boundary, mirror of ``decode_image``/``decode_audio``:
    real deployments pass ffmpeg/PyAV here; without an injected decoder,
    uncompressed 24-bit DIB AVI decodes through the pure-numpy codec in
    ``avi.py`` (so that path runs end-to-end on real bytes), and
    anything else stays an explicit stub. Returns ``(fps, frames)``
    with frames shaped (n, h, w, 3) RGB uint8."""
    if decoder is not None:
        return decoder(payload)
    from direct_kafka_stream_spark.functions import avi

    if avi.sniff_avi(bytes(payload[:12])):
        return avi.decode_avi(payload)
    raise NotImplementedError(
        "no video codec for this container in this environment; "
        "inject a decoder"
    )


AVI_FRAME_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, fps double, "
    "mean_lum double, phash long"
)


def frame_sample_avi(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """``frame_sample`` on REAL encoded video: the payloads are actual
    uncompressed-DIB AVI bytes (decoded by ``avi.py``, zero injected
    fakes), and each sampled frame's luminance/fingerprint is computed
    over genuine pixel data.

    Three-stage plan keeping the frame PLANNING JVM-side, the same
    shape as ``audio_windows_wav``:
      1. one Arrow pass parses each payload's RIFF STRUCTURE ONLY
         (``avi.parse_header`` — chunk walk, no pixel decode; it also
         verifies the regular frame stride that makes step 2 pure
         arithmetic) and re-emits the row with (data_off, stride_bytes,
         frame_size, dims, n_frames, fps) metadata attached;
      2. pure DataFrame algebra computes the every-nth frame grid —
         sequence/explode — and slices each sampled frame's exact byte
         range out of the payload with ``substring`` (frame i's pixels
         live at data_off + i*stride_bytes), so sampling and slicing
         never leave the JVM and a frame's shuffle payload is the
         frame, not the whole video;
      3. a second Arrow pass decodes each raw-DIB slice (bottom-up BGR
         rows via ``avi.decode_frame``) and emits fixed-width features:
         mean luminance + the same 64-bit average-hash fingerprint
         ``image_features`` uses (the near-dup-frame dedup key).

    At 100 TB this is the video-curation pre-processing shape:
    header-parse is O(chunk directory), sampled frames parallelize per
    input partition with zero shuffle, and only fixed-width
    (doc, frame) features flow downstream — the full pixel stream never
    crosses a stage boundary. Sampling always includes frame 0."""
    meta_schema = (
        "doc_id long, media binary, data_off long, stride_bytes long, "
        "frame_size int, width int, height int, n_frames int, fps double"
    )

    def parse_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from direct_kafka_stream_spark.functions import avi

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                h = avi.parse_header(bytes(payload))
                rows.append(
                    (
                        int(doc_id), payload, int(h["data_off"]),
                        int(h["stride_bytes"]), int(h["frame_size"]),
                        int(h["width"]), int(h["height"]),
                        int(h["n_frames"]), float(h["fps"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media", "data_off", "stride_bytes",
                    "frame_size", "width", "height", "n_frames", "fps",
                ],
            )

    with_meta = df.select("doc_id", "media").mapInPandas(
        parse_meta, schema=meta_schema
    )

    frames = with_meta.select(
        "doc_id", "media", "data_off", "stride_bytes", "frame_size",
        "width", "height", "fps",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_frames") - 1, F.lit(0)),
                F.lit(int(every_nth)),
            )
        ).alias("frame_idx"),
    ).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        "width",
        "height",
        "fps",
        # substring is 1-based; frame i's pixels start at data_off + i*stride
        F.substring(
            F.col("media"),
            (
                F.col("data_off") + F.col("frame_idx") * F.col("stride_bytes") + 1
            ).cast("int"),
            F.col("frame_size"),
        ).alias("chunk"),
    )

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from direct_kafka_stream_spark.functions import avi

        for pdf in batches:
            rows = []
            for doc_id, idx, w, h, fps, chunk in zip(
                pdf["doc_id"], pdf["frame_idx"], pdf["width"],
                pdf["height"], pdf["fps"], pdf["chunk"],
            ):
                img = avi.decode_frame(bytes(chunk), int(w), int(h))
                phash = ahash64(img)
                rows.append(
                    (
                        int(doc_id), int(idx), int(w), int(h), float(fps),
                        float(img.mean()), phash,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height", "fps",
                    "mean_lum", "phash",
                ],
            )

    return frames.mapInPandas(features, schema=AVI_FRAME_SCHEMA)
