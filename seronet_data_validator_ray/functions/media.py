"""Multimodal column plumbing: opaque `binary` payloads + typed metadata,
decoded / feature-extracted by an actor-pool map_batches stage.

The container has no image/audio codecs, so the actual decode is STUBBED:
`MediaDecoder(real=True)` raises NotImplementedError at the exact seam where
PIL/ffmpeg would plug in; the default deterministic fake decoder parses the
same fake header the encoder writes. Everything around the stub — the binary
Arrow schema, per-actor codec init, batch sizing for large payloads, and the
feature output layout — is real and tested.

At 100 TB of media: payloads dominate block size, so the stage runs with a
small `batch_size` and `num_cpus>=1` per actor, and the decoded features
(tiny) flow on while the binary column is dropped immediately after decode.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from seronet_data_validator_ray.util import read_sf_table as _read_sf_table
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("media_type", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("n_bytes", pa.int64()),
    ]
)

_MAGIC = b"FAKEIMG1"


def encode_fake_media_batch(batch: pa.Table) -> pa.Table:
    """documents -> fake media rows: an 8-byte magic + packed (w, h, frames)
    header followed by the utf8 text bytes as the 'pixel' payload."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    payloads = []
    for txt in batch["text"].to_pylist():
        raw = txt.encode()
        w = 16 + len(raw) % 64
        h = 16 + (len(raw) * 7) % 64
        frames = 1 + len(raw) % 4
        payloads.append(_MAGIC + struct.pack("<III", w, h, frames) + raw)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "media_type": pa.array(["image/fake"] * len(ids), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class MediaDecoder:
    """Actor-pool stage: codec 'loaded' once per actor in __init__, decode +
    feature-extract per batch; the binary column never leaves this stage."""

    def __init__(self, real: bool = False):
        self.real = real
        if real:
            raise NotImplementedError(
                "real decode needs an image/audio codec (PIL/ffmpeg) — not in this container; "
                "swap this branch for the codec import when deploying"
            )
        self._codec = "fake-v1"

    def _decode(self, payload: bytes):
        if self.real:  # pragma: no cover - stub seam
            raise NotImplementedError
        assert payload[:8] == _MAGIC, "bad media payload"
        w, h, frames = struct.unpack("<III", payload[8:20])
        body = payload[20:]
        return w, h, frames, body

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out = {"doc_id": [], "width": [], "height": [], "n_frames": [], "feat_u": []}
        for doc_id, payload in zip(ids, batch["payload"].to_pylist()):
            w, h, frames, body = self._decode(payload)
            # deterministic 'embedding' scalar: first 8 digest bytes of the body
            feat = int.from_bytes(
                hashlib.blake2b(body, digest_size=8).digest(), "little"
            ) & ((1 << 63) - 1)
            out["doc_id"].append(int(doc_id))
            out["width"].append(w)
            out["height"].append(h)
            out["n_frames"].append(frames)
            out["feat_u"].append(feat)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "width": pa.array(out["width"], type=pa.int64()),
                "height": pa.array(out["height"], type=pa.int64()),
                "n_frames": pa.array(out["n_frames"], type=pa.int64()),
                "feat_u": pa.array(out["feat_u"], type=pa.int64()),
            }
        )


def media_features(sf_dir: str) -> pa.Table:
    """documents -> fake binary media -> actor-pool decode -> features.
    Small batch_size: binary payloads dominate memory at scale."""
    import ray.data

    from seronet_data_validator_ray.util import ds_to_table

    docs = _read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    media = docs.map_batches(encode_fake_media_batch, batch_format="pyarrow", zero_copy_batch=True)
    feats = media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"real": False},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=2,
    )
    return ds_to_table(feats)


def sample_frames_batch(batch: pa.Table) -> pa.Table:
    """Frame-sampling flat_map: one media row -> n_frames frame rows
    (doc_id, frame_idx, width, height, frame_u). The fake 'frame' is a
    deterministic digest of (body, frame_idx) — the real decoder slots into
    the same row-expansion shape. Dims ride along so the expansion itself
    (count + per-frame metadata) is oracle-checkable without the digest."""
    ids, fidx, ws, hs, fu = [], [], [], [], []
    for doc_id, payload in zip(
        batch["doc_id"].to_numpy(zero_copy_only=False), batch["payload"].to_pylist()
    ):
        assert payload[:8] == _MAGIC
        (w, h, frames) = struct.unpack("<III", payload[8:20])
        body = payload[20:]
        for k in range(frames):
            ids.append(int(doc_id))
            fidx.append(k)
            ws.append(w)
            hs.append(h)
            fu.append(
                int.from_bytes(
                    hashlib.blake2b(body + bytes([k]), digest_size=8).digest(), "little"
                ) & ((1 << 63) - 1)
            )
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(fidx, type=pa.int64()),
            "width": pa.array(ws, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "frame_u": pa.array(fu, type=pa.int64()),
        }
    )


def media_frames(sf_dir: str) -> pa.Table:
    """documents -> fake media -> frame sampling (row expansion)."""
    import ray.data

    from seronet_data_validator_ray.util import ds_to_table

    docs = _read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    media = docs.map_batches(encode_fake_media_batch, batch_format="pyarrow", zero_copy_batch=True)
    frames = media.map_batches(
        sample_frames_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=64
    )
    return ds_to_table(frames)


class MediaResizer:
    """Actor-pool resize stage (binary -> binary): nearest-neighbor
    downsample to fit 32x32, payload re-encoded under the same fake header.
    Same stub seam as MediaDecoder — a real image lib replaces _resize only;
    the schema, actor init, and byte-budget math are the deployable parts."""

    MAX_W = 32
    MAX_H = 32

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError(
                "real resize needs an image codec (PIL) — not in this container"
            )
        self._codec = "fake-v1"

    def _resize(self, payload: bytes):
        assert payload[:8] == _MAGIC, "bad media payload"
        w, h, frames = struct.unpack("<III", payload[8:20])
        body = payload[20:]
        w2, h2 = min(w, self.MAX_W), min(h, self.MAX_H)
        nraw = len(body)
        out_len = (nraw * w2 * h2) // (w * h)
        # nearest-neighbor byte sampling (the 1-D analog of NN pixel resize)
        if out_len > 0:
            idx = (np.arange(out_len, dtype=np.int64) * nraw) // out_len
            sampled = bytes(np.frombuffer(body, dtype=np.uint8)[idx])
        else:
            sampled = b""
        return w2, h2, frames, _MAGIC + struct.pack("<III", w2, h2, frames) + sampled

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out = {"doc_id": [], "width_out": [], "height_out": [], "payload": []}
        for doc_id, payload in zip(ids, batch["payload"].to_pylist()):
            w2, h2, _frames, resized = self._resize(payload)
            out["doc_id"].append(int(doc_id))
            out["width_out"].append(w2)
            out["height_out"].append(h2)
            out["payload"].append(resized)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "width_out": pa.array(out["width_out"], type=pa.int64()),
                "height_out": pa.array(out["height_out"], type=pa.int64()),
                "payload": pa.array(out["payload"], type=pa.binary()),
                "n_bytes_out": pa.array([len(p) for p in out["payload"]], type=pa.int64()),
            }
        )


def media_resize(sf_dir: str) -> pa.Table:
    """documents -> fake media -> actor-pool resize -> output metadata (the
    resized binary is dropped before the result table, as a real pipeline
    would write it to a binary sink instead). The output dims and byte
    budget are pure integer functions of the input dims, so a DuckDB oracle
    checks them end-to-end even though SQL never sees the payload."""
    import ray.data

    from seronet_data_validator_ray.util import ds_to_table

    docs = _read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    media = docs.map_batches(encode_fake_media_batch, batch_format="pyarrow", zero_copy_batch=True)
    resized = media.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"real": False},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=2,
    )
    return ds_to_table(resized.drop_columns(["payload"]))
