"""Sequence utilities mirrored from the reference.

Parity target: utils/Utils.java rc()/Translate (:84-117, :496-507) --
reverse complement with IUPAC codes; unknown characters map to themselves.
"""

from __future__ import annotations

_TRANSLATE = {
    "A": "T", "B": "V", "C": "G", "D": "H", "G": "C", "H": "D",
    "K": "M", "M": "K", "N": "N", "R": "Y", "S": "S", "T": "A",
    "V": "B", "W": "W", "Y": "R",
}

_RC_TABLE = bytes(
    ord(_TRANSLATE.get(chr(c), chr(c))) for c in range(256)
)


def reverse_complement(seq: str) -> str:
    """Utils.rc: reverse and complement, IUPAC aware, unknowns unchanged."""
    return seq.encode("ascii").translate(_RC_TABLE)[::-1].decode("ascii")


def rc_bytes(seq: bytes) -> bytes:
    return seq.translate(_RC_TABLE)[::-1]
