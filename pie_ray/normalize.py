"""Frozen normalization rules shared by NER, triple emission, linking and the
golden-oracle builder. These define the canonical `norm` form per entity type
and the entity-key scheme — changing them changes the triple comparison
surface, so they are versioned alongside the stripper spec.
"""

from __future__ import annotations

import re

NORM_SPEC_VERSION = 1

_WS_RE = re.compile(r"\s+")
_NON_DIGIT_RE = re.compile(r"[^0-9]")


def norm_ws(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


def norm_per(surface: str) -> str:
    """Person: lowercase, collapse whitespace. Alias variants ('J. Smith',
    'Smith, John') stay distinct here — unification is linking's job."""
    return norm_ws(surface.lower())


def norm_email(surface: str) -> str:
    return surface.strip().lower()


def norm_phone(surface: str) -> str:
    """Digits only; drop a leading country '1' on 11-digit numbers."""
    d = _NON_DIGIT_RE.sub("", surface)
    if len(d) == 11 and d.startswith("1"):
        d = d[1:]
    return d


def norm_addr(surface: str) -> str:
    return norm_ws(surface.lower())


def norm_id(surface: str) -> str:
    return norm_ws(surface.upper())


NORMALIZERS = {
    "PER": norm_per,
    "EMAIL": norm_email,
    "PHONE": norm_phone,
    "ADDR": norm_addr,
    "ID": norm_id,
}


def normalize(ent_type: str, surface: str) -> str:
    return NORMALIZERS[ent_type](surface)


def entity_key(ent_type: str, norm: str) -> str:
    """Linking key: '<type-lower>:<norm>'. canon_id = min key in component."""
    return f"{ent_type.lower()}:{norm}"


def url_domain(url: str) -> str:
    """Registrable-host extraction (frozen rule): strip scheme, creds, port,
    path; lowercase; strip a leading 'www.'."""
    s = url
    i = s.find("://")
    if i >= 0:
        s = s[i + 3 :]
    for sep in ("/", "?", "#"):
        j = s.find(sep)
        if j >= 0:
            s = s[:j]
    at = s.rfind("@")
    if at >= 0:
        s = s[at + 1 :]
    colon = s.find(":")
    if colon >= 0:
        s = s[:colon]
    s = s.lower()
    if s.startswith("www."):
        s = s[4:]
    return s


def char_shingles(s: str, k: int = 3) -> set[str]:
    """Char k-gram shingle set used by linking (and its exact-Jaccard oracle).
    Strings shorter than k contribute themselves as a single shingle."""
    if len(s) < k:
        return {s} if s else set()
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    if inter == 0:
        return 0.0
    return inter / (len(a) + len(b) - inter)
