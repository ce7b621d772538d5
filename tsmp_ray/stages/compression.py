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

Encoding is FULLY VECTORIZED: each value maps to ≤3 (code, width) items
(numpy select over magnitude levels, vectorized clz/ctz), and one
``_pack_codes`` pass expands all items into an MSB-first bit matrix packed
with ``np.packbits`` — no per-value Python. The Gorilla encoder always emits
an explicit '11' window per nonzero XOR (never the '10' previous-window
reuse): the format stays decoder-compatible (reuse is an encoder choice) and
the ~10 % size cost buys a fully-parallel encode. Decoding remains a
sequential bit cursor (variable-length prefixes are data-dependent).
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


def _pack_codes(codes: np.ndarray, widths: np.ndarray) -> bytes:
    """Vectorized MSB-first bit packing of (code, width≤64) items: expand to
    a masked bit matrix, compress to the flat bit stream, ``np.packbits``.
    Bit-identical to the sequential ``_BitWriter`` stream. Item chunks bound
    the temp matrices (cache-resident; also caps first-touch cost where the
    bench's malloc tuning isn't inherited)."""
    codes = codes.astype(np.uint64)
    widths = widths.astype(np.int64)
    if len(widths) == 0:
        return b""
    total_bits = int(widths.sum())
    flat = np.empty(total_bits, dtype=np.uint8)
    pos = 0
    CH = 32_768  # small chunks: temps stay cache-resident and the one-time
    # heap first-touch (expensive in this sandbox) is ~45 MB, not hundreds
    for lo in range(0, len(codes), CH):
        c = codes[lo : lo + CH]
        w = widths[lo : lo + CH].astype(np.int16)
        w_max = int(w.max())
        shifts = w[:, None] - 1 - np.arange(w_max, dtype=np.int16)[None, :]
        valid = shifts >= 0
        bits = ((c[:, None] >> shifts.clip(min=0).astype(np.uint8))
                & np.uint64(1)).astype(np.uint8)
        nb = int(w.sum())
        flat[pos : pos + nb] = bits[valid]  # row-major MSB-first per item
        pos += nb
    return np.packbits(flat, bitorder="big").tobytes()


def _split64(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """64-bit value -> (hi32, lo32) codes (packer items are ≤64 bits; the
    5-bit escape prefix + 64-bit payload would overflow one item)."""
    v = vals.astype(np.uint64)
    return (v >> np.uint64(32)).astype(np.uint64), (v & np.uint64(0xFFFFFFFF))


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    ts = np.asarray(ts_us, dtype=np.int64)
    n = len(ts)
    items_c = [np.array([n], dtype=np.uint64)]
    items_w = [np.array([32], dtype=np.int64)]
    if n >= 1:
        hi, lo = _split64(np.array([ts[0]], dtype=np.int64))
        items_c += [hi, lo]
        items_w += [np.array([32]), np.array([32])]
    if n >= 2:
        deltas = np.diff(ts)
        hi, lo = _split64(deltas[:1])
        items_c += [hi, lo]
        items_w += [np.array([32]), np.array([32])]
        dod = np.diff(deltas)
        if len(dod):
            # classify into the 6 magnitude levels, vectorized
            mags = [(-(1 << (b - 1)), (1 << (b - 1))) for b, _, _ in _DOD_LEVELS]
            conds = [dod == 0] + [(dod >= lo) & (dod < hi) for lo, hi in mags]
            level = np.select(conds, np.arange(len(conds)), default=len(conds))
            # one packed item per dod for levels 0-4
            code = np.zeros(len(dod), dtype=np.uint64)
            width = np.ones(len(dod), dtype=np.int64)
            for li, (b, prefix, plen) in enumerate(_DOD_LEVELS, start=1):
                m = level == li
                offs = dod[m] + (1 << (b - 1))  # offset-binary payload
                code[m] = ((np.uint64(prefix) << np.uint64(b))
                           | offs.astype(np.uint64))
                width[m] = plen + b
            # escape level: 3 items (prefix, hi32, lo32) spliced in order
            esc = level == len(conds)
            if esc.any():
                order = np.argsort(
                    np.concatenate([np.arange(len(dod), dtype=np.int64),
                                    np.flatnonzero(esc), np.flatnonzero(esc)]),
                    kind="stable")
                hi, lo = _split64(dod[esc])
                code[esc] = np.uint64(0b11111)
                width[esc] = 5
                code = np.concatenate([code, hi, lo])[order]
                width = np.concatenate(
                    [width, np.full(esc.sum(), 32, dtype=np.int64),
                     np.full(esc.sum(), 32, dtype=np.int64)])[order]
            items_c.append(code)
            items_w.append(width)
    return _pack_codes(np.concatenate(items_c), np.concatenate(items_w))


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


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0). float64 log2 with an exact
    power-of-two correction (conversion can round up across a power)."""
    x = x.astype(np.uint64)
    out = np.zeros(len(x), dtype=np.int64)
    nz = x != 0
    if nz.any():
        f = x[nz].astype(np.float64)
        k = np.floor(np.log2(f)).astype(np.int64)
        # if rounding pushed f to the next power, x >> k == 0 — correct down
        too_big = (x[nz] >> k.astype(np.uint64)) == 0
        k[too_big] -= 1
        out[nz] = k + 1
    return out


def encode_gorilla(values: np.ndarray) -> bytes:
    vals = np.asarray(values, dtype=np.float64)
    n = len(vals)
    bits_v = vals.view(np.uint64)
    items_c = [np.array([n], dtype=np.uint64)]
    items_w = [np.array([32], dtype=np.int64)]
    if n >= 1:
        hi, lo = _split64(bits_v[:1])
        items_c += [hi, lo]
        items_w += [np.array([32]), np.array([32])]
    if n >= 2:
        xors = np.bitwise_xor(bits_v[1:], bits_v[:-1])
        nz = xors != 0
        # vectorized leading/trailing zero counts
        lead = np.minimum(64 - _bit_length_u64(xors), 31)
        low = xors & (np.uint64(0) - xors)  # lowest set bit (power of two)
        trail = np.maximum(_bit_length_u64(low) - 1, 0)
        mlen = 64 - lead - trail
        # two items per nonzero xor: '11'+lead+mlen-1 header (13 bits) then
        # the meaningful bits (≤64); zero xor is the single '0' bit
        code = np.zeros(len(xors), dtype=np.uint64)
        width = np.ones(len(xors), dtype=np.int64)
        code[nz] = ((np.uint64(0b11) << np.uint64(11))
                    | (lead[nz].astype(np.uint64) << np.uint64(6))
                    | (mlen[nz] - 1).astype(np.uint64))
        width[nz] = 13
        payload = xors[nz] >> trail[nz].astype(np.uint64)
        order = np.argsort(
            np.concatenate([np.arange(len(xors), dtype=np.int64),
                            np.flatnonzero(nz)]), kind="stable")
        code = np.concatenate([code, payload])[order]
        width = np.concatenate([width, mlen[nz]])[order]
        items_c.append(code)
        items_w.append(width)
    return _pack_codes(np.concatenate(items_c), np.concatenate(items_w))


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
    """Packed rows -> long rows (conv_id, signal, bucket_ts, mean_v).
    Per-blob decode is the (sequential) bit cursor; row assembly is numpy
    (np.repeat over run lengths), no Python value lists."""
    ts_parts, val_parts, lens = [], [], []
    for i in range(batch.num_rows):
        ts = decode_timestamps(batch["ts_dod"][i].as_py())
        val_parts.append(decode_gorilla(batch["val_gorilla"][i].as_py()))
        ts_parts.append(ts)
        lens.append(len(ts))
    lens = np.array(lens, dtype=np.int64)
    conv = np.repeat(batch["conv_id"].to_numpy(zero_copy_only=False), lens)
    sig = np.repeat(batch["signal"].to_numpy(zero_copy_only=False), lens)
    empty_i, empty_f = np.empty(0, dtype=np.int64), np.empty(0)
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "signal": pa.array(sig, pa.string()),
            "bucket_ts": pa.array(
                np.concatenate(ts_parts) if ts_parts else empty_i, pa.int64()),
            "mean_v": pa.array(
                np.concatenate(val_parts) if val_parts else empty_f, pa.float64()),
        }
    )
