"""Multimodal (binary-payload) column plumbing.

Images / audio / video are opaque ``binary`` columns with typed
metadata.  The Ray-side plumbing — schemas, small batches for wide
rows, actor-pool signatures, output layout — is real and tested; the
codec kernels themselves are STUBS (no image/audio libraries exist in
this environment): ``decode="fake"`` runs a deterministic stand-in so
pipelines are exercisable end-to-end, ``decode="real"`` raises
``NotImplementedError`` at the exact spot a codec (Pillow/ffmpeg/…)
would be called.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.uint64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when unknown/not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int64()),
])


def media_batch(ids, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for a batch of ids — pure function
    (stateless, reusable driver-side for oracle-input generation)."""
    kinds, payloads, mimes, ws, hs, durs = [], [], [], [], [], []
    for i in ids:
        i = int(i)
        kind = ("image", "audio", "video")[i % 3]
        size = 512 + (i * 2654435761) % 4096
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (size // 32 + 1)
        kinds.append(kind)
        payloads.append(payload[:size])
        mimes.append({"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[kind])
        ws.append(64 + i % 512 if kind != "audio" else -1)
        hs.append(64 + (i * 7) % 512 if kind != "audio" else -1)
        durs.append(-1 if kind == "image" else 1000 + i % 60000)
    return pa.table({
        "media_id": pa.array([int(x) for x in ids], pa.uint64()),
        "kind": pa.array(kinds), "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(mimes), "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "duration_ms": pa.array(durs, pa.int64()),
    })


def synth_media(n: int, seed: int = 42):
    """Deterministic fake media table (binary payloads with real sizes)."""
    import ray.data as rd

    return rd.range(n).map_batches(
        lambda batch: media_batch(batch["id"], seed),
        batch_format="numpy", batch_size=512)


class MediaDecoder:
    """Actor-pool stage: payload → decoded features.

    Real codecs load in ``__init__`` ONCE per actor (that is the whole
    point of the actor pool — model/codec state amortized over batches);
    per-batch work in ``__call__``.  Small ``batch_size`` is mandatory:
    rows are wide (binary payloads), so batch × concurrency must fit the
    worker heap (map_batches(…, batch_size=64) in ``decode_stage``).
    """

    def __init__(self, mode: str = "fake"):
        self.mode = mode
        self._pil_image = None
        if mode == "real":
            # Pillow is the first real codec adapter; it loads ONCE per
            # actor here.  Audio/video codecs (av/ffmpeg) would slot in
            # the same way; image rows Pillow can't parse and non-image
            # kinds fall back to the deterministic stand-in per row.
            try:
                from PIL import Image
            except ImportError as exc:
                raise NotImplementedError(
                    "mode='real' needs the optional Pillow wheel, which "
                    "is not available in this environment; use "
                    "mode='fake' (deterministic stand-in)") from exc
            self._pil_image = Image

    def _decode_fake(self, p: bytes):
        """Deterministic stand-in: digest-derived 16-dim feature."""
        arr = np.frombuffer(p, dtype=np.uint8)
        digest = hashlib.sha256(p).digest()
        vec = (np.frombuffer(digest, dtype=np.uint8)[:16].astype(np.float32)
               / 255.0)
        return vec.tolist(), float(arr.mean()) if len(arr) else 0.0

    def _decode_real(self, p: bytes, kind: str):
        """Pillow decode for image rows: 4×4 grayscale thumbnail as the
        16-dim feature, pixel mean as ``byte_mean``.  Anything Pillow
        can't open (or non-image kinds, pending an av adapter) falls
        back to the stand-in so the stage never poisons the pipeline."""
        if kind == "image" and self._pil_image is not None:
            import io
            try:
                with self._pil_image.open(io.BytesIO(p)) as im:
                    gray = im.convert("L").resize((4, 4))
                    px = np.asarray(gray, dtype=np.float32)
                full_mean = float(np.asarray(
                    self._pil_image.open(io.BytesIO(p)).convert("L"),
                    dtype=np.float32).mean())
                return (px.flatten() / 255.0).tolist(), full_mean
            except Exception:
                pass
        return self._decode_fake(p)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        # decode is inherently per-row (opaque binary); one output row
        # per input row, schema identical across fake/real modes
        feats, means, sizes = [], [], []
        for p, kind in zip(payloads, kinds):
            if self.mode == "real":
                vec, mean = self._decode_real(p, kind)
            else:
                vec, mean = self._decode_fake(p)
            feats.append(vec)
            means.append(mean)
            sizes.append(len(p))
        return pa.table({
            "media_id": batch["media_id"], "kind": batch["kind"],
            "n_bytes": pa.array(sizes, pa.int64()),
            "byte_mean": pa.array(means, pa.float64()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


def decode_stage(media_ds, mode: str = "fake", concurrency=(1, 4)):
    """media → decoded features.  batch_size kept small for wide rows."""
    return media_ds.map_batches(
        MediaDecoder, fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow", batch_size=64, concurrency=concurrency)


def resize_stage(decoded_ds, target: int = 8):
    """'Resize' analog on the fake features: fold the feature vector to
    ``target`` dims (a real pipeline would resize pixels here).
    Stateless task — no codec state needed."""
    def f(t: pa.Table) -> pa.Table:
        feats = [np.asarray(v, dtype=np.float32) for v in t["feature"].to_pylist()]
        folded = [f_[:target] if len(f_) >= target
                  else np.pad(f_, (0, target - len(f_))) for f_ in feats]
        return t.set_column(t.column_names.index("feature"), "feature",
                            pa.array([x.tolist() for x in folded],
                                     pa.list_(pa.float32())))

    return decoded_ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def frame_sample_stage(media_ds, every_ms: int = 1000):
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (flat-map shape).  Frame bytes are stubbed."""
    def f(t: pa.Table) -> pa.Table:
        ids, kinds, ts = [], [], []
        for mid, kind, dur in zip(t["media_id"].to_pylist(),
                                  t["kind"].to_pylist(),
                                  t["duration_ms"].to_pylist()):
            if kind != "video" or dur <= 0:
                continue
            for stamp in range(0, int(dur), every_ms):
                ids.append(mid)
                kinds.append(kind)
                ts.append(stamp)
        return pa.table({
            "media_id": pa.array(ids, pa.uint64()),
            "kind": pa.array(kinds, pa.string()),
            "frame_ts_ms": pa.array(ts, pa.int64()),
        })

    return media_ds.map_batches(f, batch_format="pyarrow", batch_size=64)
