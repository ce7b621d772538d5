"""Columnar time-series compression packed into Arrow binary columns.

Two codecs from the Gorilla paper (Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015), re-implemented from the
published bit layouts (no reference-repo analog — the reference has the
*primitive* ``diff_lag`` /root/reference/src/math.cpp:51-72; the engine packs
with it per north_star):

- ``encode_timestamps`` / ``decode_timestamps``: delta-of-delta int64 µs.
  Header: first ts (64b) + first delta zigzag-varint; then per point a
  variable-length code by delta-of-delta magnitude:
      '0'                     dod == 0
      '10'  +  7b            dod in [-64, 63]
      '110' +  9b            dod in [-256, 255]
      '1110' + 12b           dod in [-2048, 2047]
      '11110' + 32b          dod in [-2^31, 2^31-1]
      '11111' + 64b          otherwise (full range; Gorilla's 4-level scheme
                             extended one level so arbitrary µs gaps fit)
  Signed fields are stored offset-binary (value + 2^(bits-1)).

- ``encode_gorilla`` / ``decode_gorilla``: float64 XOR compression.
  First value raw 64b; then per value XOR with predecessor:
      '0'                      xor == 0
      '10' + meaningful bits   reuse previous (leading, length) window
      '11' + 5b leading + 6b length + bits   new window
  Round-trip is bit-exact for every float64 including ±0.0, NaN payloads,
  denormals and infinities (tested), because everything goes through raw u64
  views.

Encoding walks values in Python over numpy-prepared codes (bounded by block
size); decoding is the hot read path and works on a numpy bit cursor.
``pack_rollup_series`` turns a tier-point Dataset into one packed row per
(conv_id, signal): (ts_dod:binary, val_gorilla:binary, n:int32).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        remaining = bits
        while remaining > 0:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, remaining)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            remaining -= take
        self.pos = pos
        return out


_DOD_LEVELS = ((7, 0b10, 2), (9, 0b110, 3), (12, 0b1110, 4), (32, 0b11110, 5))


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    ts = np.asarray(ts_us, dtype=np.int64)
    w = _BitWriter()
    w.write(len(ts), 32)
    if len(ts) == 0:
        return w.bytes()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if len(ts) == 1:
        return w.bytes()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dod = np.diff(deltas)
    for d in dod:
        d = int(d)
        if d == 0:
            w.write(0, 1)
            continue
        for bits, prefix, plen in _DOD_LEVELS:
            lo = -(1 << (bits - 1))
            if lo <= d < -lo:
                w.write(prefix, plen)
                w.write(d - lo, bits)
                break
        else:
            w.write(0b11111, 5)
            w.write(d & ((1 << 64) - 1), 64)
    return w.bytes()


def decode_timestamps(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = _to_signed(r.read(64), 64)
    if n == 1:
        return out
    delta = _to_signed(r.read(64), 64)
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            level = 0
            while level < 4 and r.read(1) == 1:
                level += 1
            if level < 4:
                bits = _DOD_LEVELS[level][0]
                dod = r.read(bits) - (1 << (bits - 1))
            else:
                dod = _to_signed(r.read(64), 64)
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def _to_signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def encode_gorilla(values: np.ndarray) -> bytes:
    vals = np.asarray(values, dtype=np.float64)
    bits_v = vals.view(np.uint64)
    w = _BitWriter()
    w.write(len(vals), 32)
    if len(vals) == 0:
        return w.bytes()
    w.write(int(bits_v[0]), 64)
    prev = int(bits_v[0])
    lead_prev, len_prev = -1, -1
    xors = np.bitwise_xor(bits_v[1:], bits_v[:-1]) if len(vals) > 1 else []
    for x in xors:
        x = int(x)
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - x.bit_length()
        lead = min(lead, 31)  # 5-bit field
        trail = (x & -x).bit_length() - 1
        mlen = 64 - lead - trail
        if (lead_prev >= 0 and lead >= lead_prev
                and trail >= (64 - lead_prev - len_prev)):
            # fits previous window
            w.write(0b10, 2)
            shift = 64 - lead_prev - len_prev
            w.write(x >> shift, len_prev)
        else:
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mlen - 1, 6)  # 1..64 stored as 0..63
            w.write(x >> trail, mlen)
            lead_prev, len_prev = lead, mlen
    return w.bytes()


def decode_gorilla(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, mlen = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            mlen = r.read(6) + 1
        shift = 64 - lead - mlen
        x = r.read(mlen) << shift
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


# ------------------------------------------------------------- Ray stage


def pack_rollup_series(ds_tier):
    """Tier points -> one packed row per (conv_id, signal):
    (conv_id, signal, n:int32, ts_dod:binary, val_gorilla:binary).
    Values packed are the per-bucket means in bucket_ts order."""

    def _pack(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[("bucket_ts", "ascending")])
        batch = batch.take(order)
        ts = batch["bucket_ts"].to_numpy()
        vals = batch["mean_v"].to_numpy()
        return pa.table(
            {
                "conv_id": pa.array([batch["conv_id"][0].as_py()]),
                "signal": pa.array([batch["signal"][0].as_py()]),
                "n": pa.array([len(ts)], pa.int32()),
                "ts_dod": pa.array([encode_timestamps(ts)], pa.binary()),
                "val_gorilla": pa.array([encode_gorilla(vals)], pa.binary()),
            }
        )

    return ds_tier.groupby(["conv_id", "signal"]).map_groups(
        _pack, batch_format="pyarrow"
    )


def unpack_series(batch: pa.Table) -> pa.Table:
    """Packed rows -> long rows (conv_id, signal, bucket_ts, mean_v)."""
    outs = {"conv_id": [], "signal": [], "bucket_ts": [], "mean_v": []}
    for i in range(batch.num_rows):
        ts = decode_timestamps(batch["ts_dod"][i].as_py())
        vals = decode_gorilla(batch["val_gorilla"][i].as_py())
        outs["conv_id"].extend([batch["conv_id"][i].as_py()] * len(ts))
        outs["signal"].extend([batch["signal"][i].as_py()] * len(ts))
        outs["bucket_ts"].extend(ts.tolist())
        outs["mean_v"].extend(vals.tolist())
    return pa.table(
        {
            "conv_id": pa.array(outs["conv_id"], pa.string()),
            "signal": pa.array(outs["signal"], pa.string()),
            "bucket_ts": pa.array(outs["bucket_ts"], pa.int64()),
            "mean_v": pa.array(outs["mean_v"], pa.float64()),
        }
    )
