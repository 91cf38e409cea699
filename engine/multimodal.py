"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Image decode is REAL for PNG / BMP / PPM / GIF / TIFF / JPEG (baseline +
progressive) / lossless WebP (VP8L), and video frame sampling for
uncompressed-DIB and Motion-JPEG AVI — stdlib zlib/LZW/RIFF + numpy
(engine/imagecodec.py, jpegcodec.py, webpcodec.py), no external codec
needed, verified pixel-exact by round-trip tests and DuckDB-oracled
queries. The remaining compressed formats (arithmetic JPEG, lossy-VP8
WebP, mp3/ogg audio) are DEPLOYMENT-GATED: pillow / soundfile are used
when importable, and deterministic clearly-marked stubs otherwise (this
container ships neither). Everything Ray-side — schemas, batch sizing,
actor signatures, output layout, error channel — is identical either way
and fully tested.

Design rules encoded here (the 100 TB shape):
- media rows are LARGE: stages default to small ``batch_size`` so a batch ×
  concurrency fits worker heaps, mirroring the pipeline's large-row lane;
- decode/feature stages are ACTOR pools (real deployments hold model weights /
  codec contexts per actor — this is the case where actors beat tasks);
- outputs are fixed-width feature columns (list<float>) + typed metadata, so
  downstream similarity/dedup stages (engine.similarity) compose directly.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

import ray.data

from engine import audiocodec as _audiocodec
from engine import imagecodec as _imagecodec

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),  # images/video; -1 otherwise
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),  # audio/video; -1 otherwise
    ]
)

FEATURE_DIM = 32


class MediaDecodeError(ValueError):
    pass


# Deployment gate: real codecs load when available, the deterministic
# stubs below otherwise (this container ships neither pillow nor
# soundfile). The Ray-side plumbing — schemas, actor shape, batch sizing,
# error channel — is identical either way; ONLY the decode kernel swaps.
try:  # pragma: no cover - not installed in this environment
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None
try:  # pragma: no cover - not installed in this environment
    import soundfile as _soundfile
except ImportError:
    _soundfile = None


def _pseudo_bytes(seed: int, n: int) -> np.ndarray:
    """Deterministic uint8 stream from a seed — one vectorized multiply-hash
    (Knuth 2654435761), no RandomState (whose SeedSequence spin-up alone cost
    ~70 µs/row in the hot feature stage)."""
    idx = np.arange(n, dtype=np.uint64)
    mixed = (idx + np.uint64(seed)) * np.uint64(2654435761)
    mixed ^= mixed >> np.uint64(13)
    return (mixed & np.uint64(0xFF)).astype(np.uint8)


def _decode_image(payload: bytes) -> np.ndarray:
    """payload → HxWx3 uint8.

    PNG / BMP / PPM / GIF / TIFF / JPEG (baseline AND progressive) /
    lossless-WebP (VP8L) payloads (magic-byte routed) decode through the
    REAL stdlib codecs in engine/imagecodec.py, jpegcodec.py and
    webpcodec.py — no external library needed. Everything else uses
    pillow when installed (arithmetic JPEG/lossy WebP/…, the deployment
    path), and otherwise a deterministic
    clearly-marked STUB fake derived
    from the payload hash so the plumbing (shapes, dtypes, feature
    extraction, tests) is exercised end-to-end without the codec.
    Raises on empty/undecodable payload like a real decoder."""
    if not payload:
        raise MediaDecodeError("empty image payload")
    if (payload[:8] == _imagecodec.PNG_SIG
            or payload[:2] in (b"BM", b"P6")
            or payload[:6] in _imagecodec.GIF_SIGS
            or payload[:4] in _imagecodec.TIFF_SIGS):
        try:
            if payload[:2] == b"BM":
                return _imagecodec.decode_bmp(payload)
            if payload[:2] == b"P6":
                return _imagecodec.decode_ppm(payload)
            if payload[:6] in _imagecodec.GIF_SIGS:
                return _imagecodec.decode_gif(payload)
            if payload[:4] in _imagecodec.TIFF_SIGS:
                return _imagecodec.decode_tiff(payload)
            return _imagecodec.decode_png(payload)
        except ValueError as exc:
            raise MediaDecodeError(f"image decode failed: {exc}") from exc
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from engine.webpcodec import decode_webp

        try:
            return decode_webp(payload)
        except ValueError as exc:
            # lossy VP8: pillow when present, else honest error
            if _PILImage is None:
                raise MediaDecodeError(
                    f"image decode failed: {exc}") from exc
    if payload[:3] == b"\xff\xd8\xff":
        from engine.jpegcodec import decode_jpeg

        try:
            return decode_jpeg(payload)
        except ValueError as exc:
            # non-baseline/subsampled JPEG: pillow when present, else error
            if _PILImage is None:
                raise MediaDecodeError(
                    f"image decode failed: {exc}") from exc
    if _PILImage is not None:  # pragma: no cover - deployment path
        import io

        try:
            img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(img, dtype=np.uint8)
        except Exception as exc:
            raise MediaDecodeError(f"image decode failed: {exc}") from exc
    seed = zlib.crc32(payload)
    h, w = 8 + seed % 24, 8 + (seed >> 8) % 24
    return _pseudo_bytes(seed, h * w * 3).reshape(h, w, 3)


def _decode_audio(payload: bytes) -> np.ndarray:
    """payload → float32 mono PCM.

    RIFF/WAVE payloads decode through the REAL stdlib codec
    (engine/audiocodec.py — 16-bit PCM, G.711 A-law/µ-law, IMA ADPCM;
    exact integer downmix), and FLAC through engine/flaccodec.py (fixed +
    LPC predictors, Rice residuals, stereo decorrelations). Remaining
    compressed audio (mp3/ogg) uses soundfile when installed (the
    deployment path); otherwise a deterministic clearly-marked STUB
    fake."""
    if not payload:
        raise MediaDecodeError("empty audio payload")
    if payload[:4] == b"fLaC":
        from engine.flaccodec import decode_flac

        try:
            return decode_flac(payload)[0]
        except ValueError as exc:
            raise MediaDecodeError(f"audio decode failed: {exc}") from exc
    if payload[:4] == b"RIFF":
        try:
            return _audiocodec.decode_wav(payload)[0]
        except ValueError as exc:
            raise MediaDecodeError(f"audio decode failed: {exc}") from exc
    if _soundfile is not None:  # pragma: no cover - deployment path
        import io

        try:
            pcm, _sr = _soundfile.read(io.BytesIO(payload), dtype="float32")
            return pcm.mean(axis=1) if pcm.ndim > 1 else pcm
        except Exception as exc:
            raise MediaDecodeError(f"audio decode failed: {exc}") from exc
    seed = zlib.crc32(payload)
    n = 1024 + seed % 4096
    raw = _pseudo_bytes(seed ^ 0xA5A5, n).astype(np.float32)
    return raw / 127.5 - 1.0  # [-1, 1)


def _sample_video_frames(payload: bytes, num_frames: int = 4) -> list[np.ndarray]:
    """payload → ``num_frames`` HxWx3 uint8 frames, evenly sampled.

    Uncompressed-DIB AVI payloads (RIFF/'AVI ' magic) decode through the
    REAL stdlib codec (engine/videocodec.py). Compressed video stays the
    deployment-gated path (ffmpeg keyframe sampling in a real deployment);
    without it, a deterministic clearly-marked STUB fake keeps the
    plumbing exercised."""
    if not payload:
        raise MediaDecodeError("empty video payload")
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from engine.videocodec import decode_avi

        try:
            frames = decode_avi(payload)
        except ValueError as exc:
            raise MediaDecodeError(f"video decode failed: {exc}") from exc
        n = len(frames)
        return [frames[(i * n) // num_frames] for i in range(num_frames)]
    return [
        _decode_image(payload + struct.pack("<I", i)) for i in range(num_frames)
    ]


def resize_image(img: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """REAL kernel (not a stub): nearest-neighbor resize via index maps —
    decode is the only codec-dependent step; everything downstream of the
    HxWx3 array is plain numpy."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    cols = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return img[rows[:, None], cols[None, :]]


class ImageResizeActor:
    """Actor-pool stage: (media_id, payload) images → fixed-size uint8
    tensors as binary + shape metadata (the normalize-before-model step of a
    multimodal training pipeline). Same per-row failure isolation as
    MediaFeatureActor."""

    def __init__(self, target_h: int = 16, target_w: int = 16):
        self.th = target_h
        self.tw = target_w

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        payloads = t["payload"].to_pylist()
        tensors: list[bytes] = []
        status: list[str] = []
        for payload in payloads:
            try:
                img = _decode_image(payload or b"")
                tensors.append(resize_image(img, self.th, self.tw).tobytes())
                status.append("ok")
            except MediaDecodeError:
                tensors.append(b"")
                status.append("failed")
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "tensor": pa.array(tensors, type=pa.binary()),
            "height": pa.array([self.th] * len(ids), type=pa.int32()),
            "width": pa.array([self.tw] * len(ids), type=pa.int32()),
            "status": pa.array(status, type=pa.string()),
        })


def resize_images(ds: "ray.data.Dataset", *, target_h: int = 16,
                  target_w: int = 16, batch_size: int = 8,
                  concurrency: tuple[int, int] = (1, 8)) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageResizeActor,
        fn_constructor_kwargs={"target_h": target_h, "target_w": target_w},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def image_features(img: np.ndarray) -> np.ndarray:
    """Real kernel: channel-wise histogram features → FEATURE_DIM floats.

    One bincount over (value-bin + 10·channel) replaces 3 np.histogram calls
    — histogram's per-call uniform-bin-edge recompute (linspace+searchsorted)
    was the top cost of the media feature stage. Bin = v*10//256 over uint8,
    i.e. exact equal-width bins on [0, 256)."""
    npix = img.shape[0] * img.shape[1]
    flat = img.reshape(-1, 3).astype(np.uint16)
    idx = (flat * 10) >> 8  # bin 0..9 per channel value
    idx += np.arange(3, dtype=np.uint16) * 10
    hist = np.bincount(idx.ravel(), minlength=30).astype(np.float64)
    out = np.empty(FEATURE_DIM, dtype=np.float64)
    out[:30] = hist / max(1, npix)
    out[30] = img.shape[0] / 64.0
    out[31] = img.shape[1] / 64.0
    return out


def audio_features(pcm: np.ndarray) -> np.ndarray:
    """Real kernel: frame-energy + zero-crossing summary → FEATURE_DIM floats.

    Segmented reduction via cumsum over the 15 array_split-style frames (same
    boundaries: first n%15 frames get the extra sample) — no per-frame Python
    loop."""
    n = len(pcm)
    base, extra = divmod(n, 15)
    lens = np.full(15, base, dtype=np.int64)
    lens[:extra] += 1
    ends = np.cumsum(lens)
    starts = ends - lens
    sq = np.concatenate(([0.0], np.cumsum(pcm.astype(np.float64) ** 2)))
    energy = np.sqrt((sq[ends] - sq[starts]) / np.maximum(lens, 1))
    # within-frame zero crossings: adjacent products, frame-boundary pairs
    # excluded via the same prefix-sum trick
    prod_neg = np.concatenate(
        ([0.0], np.cumsum((pcm[:-1] * pcm[1:]) < 0))) if n > 1 else np.zeros(1)
    pe = np.minimum(np.maximum(ends - 1, 0), len(prod_neg) - 1)
    ps = np.minimum(starts, len(prod_neg) - 1)
    zc = (prod_neg[pe] - prod_neg[ps]) / np.maximum(lens - 1, 1)
    zc = np.where(lens > 1, zc, 0.0)
    out = np.empty(FEATURE_DIM, dtype=np.float64)
    out[:15] = energy
    out[15:30] = zc
    out[30] = n / 48000.0
    out[31] = 0.0
    return out


class MediaFeatureActor:
    """Actor-pool stage: (media_id, kind, payload) → features + status.

    This is the genuinely-stateful stage shape (model weights / codec contexts
    live in ``__init__`` in a real deployment), so it stays an actor pool —
    unlike the text kernel (see engine.pipeline module docstring).
    """

    def __init__(self, num_video_frames: int = 4):
        self.num_video_frames = num_video_frames
        # real deployment: load the embedding model here, once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        kinds = t["kind"].to_pylist()
        payloads = t["payload"].to_pylist()
        feats: list[list[float]] = []
        status: list[str] = []
        error: list[str] = []
        sha: list[str] = []
        for kind, payload in zip(kinds, payloads):
            payload = payload or b""
            # sha256, not sha1: the content fingerprint doubles as the SQL
            # oracle hook (DuckDB ships sha256 but no sha1)
            sha.append(hashlib.sha256(payload).hexdigest())
            try:
                if kind == "image":
                    f = image_features(_decode_image(payload))
                elif kind == "audio":
                    f = audio_features(_decode_audio(payload))
                elif kind == "video":
                    frames = _sample_video_frames(payload, self.num_video_frames)
                    f = np.mean([image_features(fr) for fr in frames], axis=0)
                else:
                    raise MediaDecodeError(f"unknown media kind: {kind}")
                feats.append([float(x) for x in f])
                status.append("ok")
                error.append("")
            except MediaDecodeError as exc:  # per-row failure, never the task
                feats.append([0.0] * FEATURE_DIM)
                status.append("failed")
                error.append(str(exc))
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "sha256": pa.array(sha, type=pa.string()),
            "features": pa.array(feats, type=pa.list_(pa.float64())),
            "status": pa.array(status, type=pa.string()),
            "error": pa.array(error, type=pa.string()),
        })


def media_features(ds: "ray.data.Dataset", *, batch_size: int = 8,
                   concurrency: tuple[int, int] = (1, 8),
                   num_video_frames: int = 4) -> "ray.data.Dataset":
    """The media feature pipeline stage. Small batches on purpose: media
    payloads are MiB-scale, so batch × pool must fit in worker heaps."""
    return ds.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"num_video_frames": num_video_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageStatsActor:
    """Actor-pool stage over REAL image decode: (media_id, payload) →
    (width, height, per-channel pixel sums). The sums are exact integers,
    which is what makes the whole decode path (container parse, inflate,
    scanline unfilter, channel order) pinnable by a DuckDB oracle over a
    planted corpus — any byte wrong anywhere moves a sum."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        payloads = t["payload"].to_pylist()
        out = {"media_id": ids, "width": [], "height": [],
               "sum_r": [], "sum_g": [], "sum_b": [], "status": []}
        for payload in payloads:
            try:
                img = _decode_image(payload or b"")
                s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
                out["status"].append("ok")
            except MediaDecodeError:
                for k, v in (("width", 0), ("height", 0), ("sum_r", 0),
                             ("sum_g", 0), ("sum_b", 0)):
                    out[k].append(v)
                out["status"].append("failed")
        return pa.table({
            "media_id": pa.array(out["media_id"], type=pa.int64()),
            "width": pa.array(out["width"], type=pa.int64()),
            "height": pa.array(out["height"], type=pa.int64()),
            "sum_r": pa.array(out["sum_r"], type=pa.int64()),
            "sum_g": pa.array(out["sum_g"], type=pa.int64()),
            "sum_b": pa.array(out["sum_b"], type=pa.int64()),
            "status": pa.array(out["status"], type=pa.string()),
        })


def image_stats(ds: "ray.data.Dataset", *, batch_size: int = 64,
                ) -> "ray.data.Dataset":
    # stateless-TASK stage on purpose: the kernel holds no per-actor state,
    # and an actor pool pays 1-2 s spin-up per query (CLAUDE.md; the same
    # reasoning as the extraction kernel — actors only where real state)
    return ds.map_batches(ImageStatsActor(), batch_format="pyarrow",
                          batch_size=batch_size)


class AudioStatsActor:
    """Actor-pool stage over REAL WAV decode: (media_id, payload) →
    (n_samples, exact integer sample sum). PCM16 values are exact in the
    float pipeline (|s| < 2^15, scaled by 2^-15), so round(sum·32768) is
    the integer sample sum — the DuckDB-oracle hook for the audio path."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        payloads = t["payload"].to_pylist()
        out = {"media_id": ids, "n_samples": [], "sum_s": [], "status": []}
        for payload in payloads:
            try:
                pcm = _decode_audio(payload or b"")
                out["n_samples"].append(len(pcm))
                out["sum_s"].append(
                    int(round(float(pcm.astype(np.float64).sum()) * 32768.0)))
                out["status"].append("ok")
            except MediaDecodeError:
                out["n_samples"].append(0)
                out["sum_s"].append(0)
                out["status"].append("failed")
        return pa.table({
            "media_id": pa.array(out["media_id"], type=pa.int64()),
            "n_samples": pa.array(out["n_samples"], type=pa.int64()),
            "sum_s": pa.array(out["sum_s"], type=pa.int64()),
            "status": pa.array(out["status"], type=pa.string()),
        })


def audio_stats(ds: "ray.data.Dataset", *, batch_size: int = 64,
                ) -> "ray.data.Dataset":
    # stateless-TASK stage, same reasoning as image_stats
    return ds.map_batches(AudioStatsActor(), batch_format="pyarrow",
                          batch_size=batch_size)


def gen_media_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic media fixture (binary payloads with typed metadata)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.randint(0, 1024)))
        if i % 17 == 0:
            payload = b""  # error-channel coverage
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(
            {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind]
        )
        rows["width"].append(int(rng.randint(64, 1920)) if kind != "audio" else -1)
        rows["height"].append(int(rng.randint(64, 1080)) if kind != "audio" else -1)
        rows["duration_ms"].append(
            int(rng.randint(1000, 60000)) if kind != "image" else -1
        )
    return pa.table(rows, schema=MEDIA_SCHEMA)


class VideoStatsActor:
    """Stage over REAL AVI decode (engine/videocodec.py): (media_id,
    payload) → (n_frames, width, height, exact per-channel pixel sums of
    the FIRST frame) — the DuckDB-oracle hook for the video path, the
    video sibling of ImageStatsActor/AudioStatsActor."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from engine.videocodec import decode_avi

        ids = t["media_id"].to_pylist()
        payloads = t["payload"].to_pylist()
        cols = {"n_frames": [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [], "status": []}
        for payload in payloads:
            try:
                if not payload:
                    raise MediaDecodeError("empty video payload")
                frames = decode_avi(payload)
                f0 = frames[0].astype(np.int64)
                cols["n_frames"].append(len(frames))
                cols["height"].append(f0.shape[0])
                cols["width"].append(f0.shape[1])
                for c, name in enumerate(("sum_r", "sum_g", "sum_b")):
                    cols[name].append(int(f0[:, :, c].sum()))
                cols["status"].append("ok")
            except (MediaDecodeError, ValueError):
                for name in ("n_frames", "width", "height",
                             "sum_r", "sum_g", "sum_b"):
                    cols[name].append(0)
                cols["status"].append("failed")
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            **{k: pa.array(v, type=pa.int64()) for k, v in cols.items()
               if k != "status"},
            "status": pa.array(cols["status"], type=pa.string()),
        })


def video_stats(ds: "ray.data.Dataset", *, batch_size: int = 16,
                ) -> "ray.data.Dataset":
    # stateless-TASK stage, same reasoning as image_stats; smaller default
    # batch: video rows are the largest media rows
    return ds.map_batches(VideoStatsActor(), batch_format="pyarrow",
                          batch_size=batch_size)
