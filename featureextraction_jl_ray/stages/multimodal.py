"""Multimodal payload stages beyond images (task brief: treat image/
audio/video as opaque binary columns with typed metadata; decode /
feature-extract / frame-sample as actor-pool stages).

The container has no audio/video codecs, so only RAW layouts decode for
real (pcm16 mono audio; packed rgb24 video frames).  Compressed formats
raise NotImplementedError with a clear message — the Ray-side plumbing
(schemas, batch sizes, actor signatures, output layout) is real and
tested, per the task's stub policy.

Canonical schemas::

    audio(clip_id:string, bytes:binary, sr:int32, n_samples:int64,
          fmt:string)                      # fmt="pcm16" = int16 LE mono
    video(video_id:string, bytes:binary, w:int32, h:int32,
          n_frames:int32, fmt:string)      # fmt="rgb24" = packed frames
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.veccol import numpy_to_fixed_list_column

__all__ = ["AudioFeatures", "VideoFrameSampler", "with_audio_features",
           "with_video_frames"]

_RAW_AUDIO = ("pcm16",)
_RAW_VIDEO = ("rgb24",)


def _decode_payload(payload, fmts, allowed, kind):
    bad = [f for f in set(fmts) if f not in allowed]
    if bad:
        raise NotImplementedError(
            f"{kind} format(s) {bad} need codec libraries not installed in "
            f"this environment; raw formats {allowed} decode natively"
        )


class AudioFeatures:
    """Actor stage: pcm16 audio → fixed-size log-energy band features.

    Real DSP (frame → band energies via a bank of averaged |FFT| bins)
    on raw audio; the per-batch loop is over CLIPS (variable length),
    vectorized within each clip.
    """

    def __init__(self, n_bands: int = 16, frame: int = 512, out_col: str = "afeat"):
        self._n_bands = n_bands
        self._frame = frame
        self._out_col = out_col

    def _clip_features(self, pcm: np.ndarray) -> np.ndarray:
        frame = self._frame
        n = (len(pcm) // frame) * frame
        if n == 0:
            return np.zeros(self._n_bands, dtype=np.float32)
        x = pcm[:n].reshape(-1, frame).astype(np.float64) / 32768.0
        spec = np.abs(np.fft.rfft(x, axis=1))  # (frames, frame//2+1)
        bands = np.array_split(np.arange(spec.shape[1]), self._n_bands)
        e = np.stack([spec[:, b].mean(axis=1) for b in bands], axis=1)
        return np.log1p(e.mean(axis=0)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch.column("fmt").to_pylist()
        _decode_payload(None, fmts, _RAW_AUDIO, "audio")
        feats = []
        for buf in batch.column("bytes").to_pylist():
            pcm = np.frombuffer(buf, dtype="<i2")
            feats.append(self._clip_features(pcm))
        return batch.append_column(
            self._out_col,
            numpy_to_fixed_list_column(np.stack(feats), pa.float32()),
        ).drop_columns(["bytes"])


class VideoFrameSampler:
    """Actor stage: rgb24 packed video → k uniformly sampled frames, each
    emitted as an image-row (reuses the image pipeline downstream)."""

    def __init__(self, k: int = 3):
        self._k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch.column("fmt").to_pylist()
        _decode_payload(None, fmts, _RAW_VIDEO, "video")
        out = {"video_id": [], "frame_idx": [], "bytes": [], "w": [], "h": [],
               "fmt": []}
        for vid, buf, w, h, nf in zip(
            batch.column("video_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("w").to_pylist(),
            batch.column("h").to_pylist(),
            batch.column("n_frames").to_pylist(),
        ):
            frame_bytes = w * h * 3
            idxs = np.unique(
                np.linspace(0, max(nf - 1, 0), min(self._k, max(nf, 1))).astype(int)
            )
            for i in idxs:
                out["video_id"].append(vid)
                out["frame_idx"].append(int(i))
                out["bytes"].append(buf[i * frame_bytes : (i + 1) * frame_bytes])
                out["w"].append(w)
                out["h"].append(h)
                out["fmt"].append("raw")
        return pa.table(
            {
                "video_id": pa.array(out["video_id"], type=pa.string()),
                "frame_idx": pa.array(out["frame_idx"], type=pa.int32()),
                "bytes": pa.array(out["bytes"], type=pa.binary()),
                "w": pa.array(out["w"], type=pa.int32()),
                "h": pa.array(out["h"], type=pa.int32()),
                "fmt": pa.array(out["fmt"], type=pa.string()),
            }
        )


def with_audio_features(ds, *, n_bands: int = 16, frame: int = 512,
                        concurrency=(1, 8), batch_size: int | None = 256):
    """Small batches: audio payloads are wide (SURVEY.md §4 memory row)."""
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"n_bands": n_bands, "frame": frame},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def with_video_frames(ds, *, k: int = 3, concurrency=(1, 8),
                      batch_size: int | None = 64):
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class SilenceTrim:
    """Actor stage: pcm16 audio → silence-trimmed pcm16 (VAD-lite) —
    the speech-corpus prep step that drops dead air before feature
    extraction / transcription: frames whose RMS falls below
    ``threshold_db`` dBFS are removed, active frames concatenate in
    order.  Emits the trimmed payload plus ``active_ratio`` (kept /
    total frames) and ``n_samples`` so a downstream filter can drop
    all-silence clips.

    Real DSP on raw audio (frame RMS via one reshape + mean of
    squares); per-batch loop is over CLIPS (variable length),
    vectorized within each clip — the AudioFeatures pattern.  The
    trailing partial frame is kept iff it is active by the same rule.
    """

    def __init__(self, frame: int = 512, threshold_db: float = -40.0,
                 out_col: str = "bytes"):
        self._frame = frame
        self._thr = 10.0 ** (threshold_db / 20.0)  # linear RMS, 1.0 = FS
        self._out_col = out_col

    def _trim(self, pcm: np.ndarray) -> tuple[bytes, float, int]:
        frame = self._frame
        if len(pcm) == 0:
            return b"", 0.0, 0
        n_full = len(pcm) // frame
        pads = len(pcm) - n_full * frame
        x = pcm.astype(np.float64) / 32768.0
        segs = []
        if n_full:
            rms = np.sqrt((x[:n_full * frame].reshape(-1, frame) ** 2)
                          .mean(axis=1))
            keep = rms > self._thr
            segs.append(pcm[:n_full * frame].reshape(-1, frame)[keep]
                        .reshape(-1))
        else:
            keep = np.zeros(0, dtype=bool)
        tail_kept = 0
        if pads:
            tail = x[n_full * frame:]
            if np.sqrt((tail ** 2).mean()) > self._thr:
                segs.append(pcm[n_full * frame:])
                tail_kept = 1
        out = (np.concatenate(segs) if segs
               else np.empty(0, dtype=pcm.dtype))
        total = n_full + (1 if pads else 0)
        ratio = float((int(keep.sum()) + tail_kept) / total) if total else 0.0
        return out.tobytes(), ratio, int(len(out))

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch.column("fmt").to_pylist()
        _decode_payload(None, fmts, _RAW_AUDIO, "audio")
        bufs, ratios, counts = [], [], []
        for buf in batch.column("bytes").to_pylist():
            b, r, n = self._trim(np.frombuffer(buf, dtype="<i2"))
            bufs.append(b)
            ratios.append(r)
            counts.append(n)
        def put(t: pa.Table, name: str, arr: pa.Array) -> pa.Table:
            # replace a preexisting same-named column (e.g. the synth
            # table ships n_samples) — duplicates break Arrow concat
            if name in t.schema.names:
                return t.set_column(t.schema.get_field_index(name),
                                    name, arr)
            return t.append_column(name, arr)

        out = put(batch, self._out_col, pa.array(bufs, type=pa.binary()))
        out = put(out, "active_ratio", pa.array(np.round(ratios, 6)))
        return put(out, "n_samples", pa.array(counts, type=pa.int64()))


def with_silence_trim(ds, *, frame: int = 512, threshold_db: float = -40.0,
                      concurrency=(1, 8), batch_size: int | None = 256):
    """Audio ds → silence-trimmed payloads + active_ratio/n_samples."""
    return ds.map_batches(
        SilenceTrim, fn_constructor_kwargs={
            "frame": frame, "threshold_db": threshold_db},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


__all__ += ["SilenceTrim", "with_silence_trim"]


def video_phash_near_dup(videos, *, k: int = 5, threshold: float = 0.6,
                         hash_method: str = "phash",
                         num_buckets: int = 64, max_df: int = 8192):
    """Video NEAR-DUP pairs by perceptual frame fingerprints: sample
    ``k`` frames per video, perceptual-hash each (``phash`` DCT default;
    ``dhash`` for brightness-shifted re-encodes, ``ahash``), and join
    videos whose frame-hash SETS overlap — exact Jaccard ≥ ``threshold``
    through the bounded inverted-index machinery
    (:func:`~.minhash.set_jaccard_pairs`): re-encoded/trimmed copies
    share most sampled-frame hashes, unrelated videos share none.

    Scale shape: pixels stay block-local (sample + hash before any
    exchange — only (video_id, int64 hash) rows shuffle, k per video);
    the join is the three bounded exchanges of the set-similarity
    operator, never O(n²).  Returns (key_a, key_b, jaccard)."""
    from .codec import HashImages
    from .minhash import set_jaccard_pairs

    frames = with_video_frames(videos, k=k)
    hashed = frames.map_batches(
        HashImages(methods=(hash_method,), drop_bytes=True),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=256)
    return set_jaccard_pairs(
        hashed.select_columns(["video_id", hash_method]),
        key_col="video_id", value_col=hash_method,
        threshold=threshold, num_buckets=num_buckets, max_df=max_df)


__all__.append("video_phash_near_dup")
