"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode step is STUBBED (no PIL/ffmpeg in this environment — task brief):
``DecodeImage``/``SampleFrames`` raise ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded from the
payload bytes) produces arrays with the right shapes so the Ray-side plumbing
— schema, batch sizing, actor signature, output layout — is real and tested.

Scale notes (per the brief): binary payloads are large, so stages run with
small ``batch_size`` and ``batch_format='pyarrow'`` (binary round-trips Arrow
zero-copy; pandas would box to objects).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synthetic_media(n: int = 32, seed: int = 0) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(["image", "audio", "video"], size=n)
    payloads, w, h, sr, nf = [], [], [], [], []
    for i, k in enumerate(kinds):
        size = int(rng.integers(256, 4096))
        payloads.append(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
        w.append(int(rng.integers(8, 64)) if k != "audio" else 0)
        h.append(int(rng.integers(8, 64)) if k != "audio" else 0)
        sr.append(16000 if k == "audio" else 0)
        nf.append(int(rng.integers(4, 16)) if k == "video" else 1)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "sample_rate": pa.array(sr, pa.int32()),
            "n_frames": pa.array(nf, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake decode: seed an RNG from the payload bytes."""
    seed = zlib.crc32(payload)
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3),
                                                dtype=np.uint8)


class DecodeImage:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    Real decode is a stub: with ``fake=False`` it raises NotImplementedError
    (image libraries are not available in this container); ``fake=True``
    substitutes the deterministic fake decoder. Resize to (out_h, out_w) then
    emit per-channel mean/std features.
    """

    def __init__(self, out_h: int = 16, out_w: int = 16, fake: bool = False):
        self.out_h, self.out_w = out_h, out_w
        self.fake = fake

    def _decode(self, payload: bytes, h: int, w: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/cv2, not present in this container;"
                " construct with fake=True for the deterministic stub"
            )
        return _fake_pixels(payload, max(h, 1), max(w, 1))

    @staticmethod
    def _resize(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
        # nearest-neighbor resize, pure numpy
        h, w = img.shape[:2]
        yi = (np.arange(oh) * h // oh).clip(0, h - 1)
        xi = (np.arange(ow) * w // ow).clip(0, w - 1)
        return img[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        ids = []
        for i in range(batch.num_rows):
            if batch["kind"][i].as_py() != "image":
                continue
            img = self._decode(batch["payload"][i].as_py(),
                               batch["height"][i].as_py(),
                               batch["width"][i].as_py())
            small = self._resize(img, self.out_h, self.out_w).astype(np.float64)
            feat = np.concatenate([small.mean(axis=(0, 1)), small.std(axis=(0, 1)),
                                   small.reshape(-1, 3).mean(axis=1)[: self.out_h]])
            feats.append(feat)
            ids.append(batch["media_id"][i].as_py())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "feature": pa.array(feats if feats else [],
                                    pa.list_(pa.float64())),
            }
        )


class AudioFeatures:
    """Audio stage: binary payload -> framed waveform features (RMS + zero
    crossings per frame). Real decode is a stub (no soundfile/ffmpeg here);
    ``fake=True`` synthesizes a deterministic waveform from the payload so
    framing/feature plumbing is real and tested."""

    def __init__(self, frame: int = 512, fake: bool = False):
        self.frame = frame
        self.fake = fake

    def _decode(self, payload: bytes, sr: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires soundfile/ffmpeg, not present in this"
                " container; construct with fake=True for the stub")
        rng = np.random.default_rng(zlib.crc32(payload))
        n = max(len(payload) * 4, self.frame)
        return rng.standard_normal(n).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rms, zc, nfr = [], [], [], []
        for i in range(batch.num_rows):
            if batch["kind"][i].as_py() != "audio":
                continue
            x = self._decode(batch["payload"][i].as_py(),
                             batch["sample_rate"][i].as_py())
            n_frames = len(x) // self.frame
            f = x[: n_frames * self.frame].reshape(n_frames, self.frame)
            ids.append(batch["media_id"][i].as_py())
            rms.append(np.sqrt((f * f).mean(axis=1)).astype(np.float64))
            zc.append((np.diff(np.signbit(f), axis=1) != 0).sum(axis=1)
                      .astype(np.float64))
            nfr.append(n_frames)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(nfr, pa.int64()),
                "rms": pa.array(rms if rms else [], pa.list_(pa.float64())),
                "zero_crossings": pa.array(zc if zc else [],
                                           pa.list_(pa.float64())),
            }
        )


class SampleFrames:
    """Video stage: sample every k-th frame index and emit one row per sampled
    frame (flat_map-shaped output from map_batches)."""

    def __init__(self, stride: int = 4, fake: bool = False):
        self.stride = stride
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames = [], []
        for i in range(batch.num_rows):
            if batch["kind"][i].as_py() != "video":
                continue
            if not self.fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg, not present; use fake=True")
            nf = batch["n_frames"][i].as_py()
            for f in range(0, nf, self.stride):
                ids.append(batch["media_id"][i].as_py())
                frames.append(f)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frames, pa.int64()),
            }
        )


def decode_stage(ds_media, *, fake: bool = True, batch_size: int = 8):
    """Wire the image-decode actor pool with multimodal-appropriate sizing:
    small batches (large binary rows), arrow format, autoscaling pool whose
    CEILING tracks the session's CPUs (round-4 verdict item 3: decode is
    the stage a real multimodal corpus scales wide — a constant cap of 4
    starved 28 of 32 cores; the floor stays 1 per the small-session
    deadlock note in CLAUDE.md)."""
    import ray

    cpus = max(4, int(ray.cluster_resources().get("CPU", 8)))
    return ds_media.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, cpus),
        num_cpus=1,
    )
