"""JSON serialization of profile objects — the reference's stable external
representation (/root/reference/R/serialize.R:29-176): 19-digit float
precision, 0-based profile indexes on disk, class/algorithm/metric attributes
embedded, Inf encoded as the string "Inf" (JSON has no Inf literal).

Our in-memory indexes are already 0-based (SURVEY.md §4.3), so only the
sentinel mapping differs: -1 in memory ↔ null on disk.
Round-trip is exact for float64 (repr with 17 significant digits).
"""

from __future__ import annotations

import json

import numpy as np

from ..kernels.profile_types import MatrixProfile


def _enc_floats(a: np.ndarray) -> list:
    out = []
    for v in a:
        if np.isinf(v):
            out.append("Inf" if v > 0 else "-Inf")
        elif np.isnan(v):
            out.append("NaN")
        else:
            out.append(float(repr(float(v))))
    return out


def _dec_floats(xs: list) -> np.ndarray:
    m = {"Inf": np.inf, "-Inf": -np.inf, "NaN": np.nan}
    return np.array([m.get(x, x) for x in xs], dtype=np.float64)


def _enc_idx(a: np.ndarray | None) -> list | None:
    if a is None:
        return None
    return [None if v < 0 else int(v) for v in a]


def _dec_idx(xs: list | None) -> np.ndarray | None:
    if xs is None:
        return None
    return np.array([-1 if x is None else int(x) for x in xs], dtype=np.int64)


def write_profile(prof: MatrixProfile, path: str) -> None:
    doc = {
        "class": "MatrixProfile",
        "algorithm": prof.algorithm,
        "metric": "znorm_euclidean",
        "version": 1,
        "w": int(prof.w),
        "ez": float(prof.ez),
        "join": bool(prof.join),
        "mp": _enc_floats(prof.mp),
        "pi": _enc_idx(prof.pi),
        "lmp": None if prof.lmp is None else _enc_floats(prof.lmp),
        "lpi": _enc_idx(prof.lpi),
        "rmp": None if prof.rmp is None else _enc_floats(prof.rmp),
        "rpi": _enc_idx(prof.rpi),
        "mpb": None if prof.mpb is None else _enc_floats(prof.mpb),
        "pib": _enc_idx(prof.pib),
    }
    with open(path, "w") as f:
        json.dump(doc, f)


def write_pmp(pan: dict, path: str, ez: float = 0.5,
              upper_window: int | None = None, algorithm: str = "pmp") -> None:
    """Serialize a pan-matrix-profile dict (``kernels.mining.pmp``'s
    ``{'pmp': {w: mp}, 'pmpi': {w: pi}, 'w': visited}``) the same way the
    reference's write.PMP does (/root/reference/R/serialize.R:72-110):
    per-window profile/index lists with 0-based indexes on disk
    (serialize.R:85), class/algorithm/metric embedded, Inf/NaN as strings.
    JSON object keys are strings; ``read_pmp`` restores integer windows."""
    doc = {
        "class": "PMP",
        "algorithm": algorithm,
        "metric": "znorm_euclidean",
        "version": 1,
        "w": [int(w) for w in pan["w"]],
        "ez": float(ez),
        "upper_window": None if upper_window is None else int(upper_window),
        "pmp": {str(w): _enc_floats(v) for w, v in pan["pmp"].items()},
        "pmpi": {str(w): _enc_idx(v) for w, v in pan["pmpi"].items()},
    }
    with open(path, "w") as f:
        json.dump(doc, f)


def read_pmp(path: str) -> dict:
    """Round-trip counterpart of :func:`write_pmp` (the reference re-bases
    pmpi to 1-based on read, serialize.R:156-157; ours stay 0-based).
    Returns the pmp dict plus the embedded ``ez`` / ``upper_window``."""
    with open(path) as f:
        doc = json.load(f)
    if doc.get("class") != "PMP":
        raise ValueError(f"not a PMP JSON: {path}")
    return {
        "pmp": {int(w): _dec_floats(v) for w, v in doc["pmp"].items()},
        "pmpi": {int(w): _dec_idx(v) for w, v in doc["pmpi"].items()},
        "w": [int(w) for w in doc["w"]],
        "ez": float(doc["ez"]),
        "upper_window": doc.get("upper_window"),
    }


def read_profile(path: str) -> MatrixProfile:
    with open(path) as f:
        doc = json.load(f)
    if doc.get("class") != "MatrixProfile":
        raise ValueError(f"not a MatrixProfile JSON: {path}")
    return MatrixProfile(
        mp=_dec_floats(doc["mp"]),
        pi=_dec_idx(doc["pi"]),
        w=int(doc["w"]),
        ez=float(doc["ez"]),
        lmp=None if doc.get("lmp") is None else _dec_floats(doc["lmp"]),
        lpi=_dec_idx(doc.get("lpi")),
        rmp=None if doc.get("rmp") is None else _dec_floats(doc["rmp"]),
        rpi=_dec_idx(doc.get("rpi")),
        mpb=None if doc.get("mpb") is None else _dec_floats(doc["mpb"]),
        pib=_dec_idx(doc.get("pib")),
        join=bool(doc.get("join", False)),
        algorithm=doc.get("algorithm", ""),
    )
