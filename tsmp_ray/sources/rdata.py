"""Minimal RData (.rda / RDX3, XDR) reader — enough of R's serialization
format to load the reference package's embedded datasets
(/root/reference/data/*.rda: named lists of numeric vectors/matrices and
data.frames) without an R runtime, so known-answer tests can run on the
REFERENCE'S OWN data (SURVEY.md §5; fixtures FIXTURES.md §F2).

Implements the XDR ("RDX3\\nX\\n") subset: NILSXP, SYMSXP, LISTSXP (pairlist),
CHARSXP, LGLSXP, INTSXP, REALSXP, STRSXP, VECSXP, REFSXP and attribute
pairlists. Data frames come back as dict[str, np.ndarray]; matrices as 2-D
arrays (column-major dims honored). Unsupported types raise.

Format reference: R Internals §"Serialization Formats" (public documentation
of the version-3 XDR layout).
"""

from __future__ import annotations

import lzma
import struct

import numpy as np

__all__ = ["read_rda"]

_NILSXP = 0
_SYMSXP = 1
_LISTSXP = 2
_CHARSXP = 9
_LGLSXP = 10
_INTSXP = 13
_REALSXP = 14
_STRSXP = 16
_VECSXP = 19
_NILVALUE = 254
_REFSXP = 255
_NA_INT = -2147483648


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.refs: list = []

    def u4(self) -> int:
        v = struct.unpack_from(">i", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def f8(self, n: int) -> np.ndarray:
        out = np.frombuffer(self.buf, dtype=">f8", count=n, offset=self.pos)
        self.pos += 8 * n
        return out.astype(np.float64)

    def i4(self, n: int) -> np.ndarray:
        out = np.frombuffer(self.buf, dtype=">i4", count=n, offset=self.pos)
        self.pos += 4 * n
        return out.astype(np.int64)

    def raw(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def length(self) -> int:
        n = self.u4()
        if n == -1:  # long vector: two 32-bit halves
            hi, lo = self.u4(), self.u4()
            n = (hi << 32) | (lo & 0xFFFFFFFF)
        return n

    def item(self):
        flags = self.u4()
        t = flags & 255
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)

        if t == _NILVALUE or t == _NILSXP:
            return None
        if t == _REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.u4()
            return self.refs[idx - 1]
        if t == _SYMSXP:
            name = self.item()  # CHARSXP
            self.refs.append(name)
            return name
        if t == _CHARSXP:
            n = self.u4()
            return None if n == -1 else self.raw(n).decode("utf-8", "replace")
        if t == _LISTSXP:
            # pairlist node: [attrib][tag] car, cdr — flatten to ordered dict
            out: dict = {}
            while True:
                attr = self.item() if has_attr else None  # noqa: F841
                tag = self.item() if has_tag else None
                car = self.item()
                out[tag if tag is not None else len(out)] = car
                flags = self.u4()
                t2 = flags & 255
                if t2 in (_NILVALUE, _NILSXP):
                    return out
                if t2 == _LISTSXP:
                    has_attr = bool(flags & 0x200)
                    has_tag = bool(flags & 0x400)
                    continue
                # cdr is a non-pairlist object (rare) — store under None
                self.pos -= 4
                out[None] = self.item()
                return out
        if t in (_LGLSXP, _INTSXP):
            n = self.length()
            vals = self.i4(n)
            return self._with_attrs(vals, has_attr)
        if t == _REALSXP:
            n = self.length()
            vals = self.f8(n)
            return self._with_attrs(vals, has_attr)
        if t == _STRSXP:
            n = self.length()
            vals = [self.item() for _ in range(n)]
            return self._with_attrs(np.array(vals, dtype=object), has_attr)
        if t == _VECSXP:
            n = self.length()
            vals = [self.item() for _ in range(n)]
            return self._with_attrs(vals, has_attr)
        raise NotImplementedError(f"SEXP type {t} not supported")

    def _with_attrs(self, vals, has_attr: bool):
        if not has_attr:
            return vals
        attrs = self.item() or {}
        names = attrs.get("names")
        dim = attrs.get("dim")
        if dim is not None and hasattr(vals, "reshape"):
            vals = vals.reshape(tuple(int(d) for d in dim), order="F")
        if names is not None and isinstance(vals, list):
            return dict(zip(list(names), vals))
        if attrs.get("class") is not None and "data.frame" in list(attrs["class"]):
            pass  # already a names-dict from the branch above
        return vals


def read_rda(path: str) -> dict:
    """Load an .rda file -> {object_name: value}. Values: numpy arrays
    (vectors/matrices), dict-of-columns (named lists / data.frames), or
    nested lists."""
    raw = open(path, "rb").read()
    if raw[:2] == b"\xfd7":
        raw = lzma.decompress(raw)
    elif raw[:2] == b"\x1f\x8b":
        import gzip

        raw = gzip.decompress(raw)
    if not raw.startswith(b"RDX3\nX\n") and not raw.startswith(b"RDX2\nX\n"):
        raise ValueError("not an XDR RData file")
    r = _Reader(raw)
    r.pos = 7
    _version = r.u4()
    _writer = r.u4()
    _min_reader = r.u4()
    if raw.startswith(b"RDX3"):
        enc_len = r.u4()
        r.raw(enc_len)  # native encoding string
    top = r.item()
    if not isinstance(top, dict):
        raise ValueError("expected a named pairlist at top level")
    return top
