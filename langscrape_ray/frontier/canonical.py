"""URL canonicalization + stable 64-bit hashing.

New design (SURVEY.md §2.2 M23): the reference never canonicalizes URLs
(only basename splitting, /root/reference/langscrape/nodes/post_processor.py:71,
and referer derivation, /root/reference/langscrape/browser/request.py:4-6).
A frontier at 10^10-URL scale needs one canonical form as the dedup +
partitioning key; these rules are the contract shared by the oracle and the
distributed engine.

Canonical form:
  - scheme lowercased; only http/https are valid
  - host lowercased, trailing dot stripped; default port (80/443) stripped
  - fragment dropped
  - tracking query params dropped (utm_*, fbclid, gclid, igshid, mc_eid);
    remaining params sorted by (key, value) for stability
  - empty path -> "/"; trailing slash stripped except on the root path
Validation failures (semantics of the reference's validate_url,
/root/reference/langscrape/nodes/url_handler.py:19-23: scheme AND netloc
required) return None.
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional, Tuple
from urllib.parse import parse_qsl, urlencode, urlsplit

_TRACKING_PARAMS = ("fbclid", "gclid", "igshid", "mc_eid")
_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Fast path: URLs that are ALREADY canonical under every rule above —
# lowercase http(s) scheme, lowercase dotted host with no trailing dot /
# port / userinfo, no query or fragment, no surrounding whitespace.  The
# only remaining transforms are "empty path -> /" (append) and the
# trailing-slash strip (excluded in code below -> falls back).  Identity
# with the general path is differential-fuzz-tested in
# tests/test_frontier.py::test_canonical_fast_path_identity.
_FAST_RE = re.compile(
    r"^(http|https)://((?:[a-z0-9-]+\.)+[a-z0-9-]+)((?:/[^/?#\s]*)*)$"
)


def canonicalize_url(url: str) -> Optional[Tuple[str, str]]:
    """Return (canonical_url, host), or None when the URL is invalid."""
    if not isinstance(url, str):
        return None
    m = _FAST_RE.match(url)
    if m is not None:
        path = m.group(3)
        if not path:
            return url + "/", m.group(2)
        if len(path) == 1 or not path.endswith("/"):
            return url, m.group(2)
        # trailing slash needs the strip rule -> general path
    if not url.strip():
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https") or not parts.netloc:
        return None
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return None
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    try:
        q = [
            (k, v)
            for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if not k.startswith("utm_") and k not in _TRACKING_PARAMS
        ]
    except ValueError:
        q = []
    query = urlencode(sorted(q)) if q else ""
    canon = f"{scheme}://{netloc}{path}"
    if query:
        canon += f"?{query}"
    return canon, host


def _h64(data: bytes, *, person: bytes) -> int:
    return int.from_bytes(
        hashlib.blake2b(data, digest_size=8, person=person).digest(), "little"
    )


def url_hash64(canonical_url: str) -> int:
    """Stable 64-bit hash of a canonical URL (dedup + join key)."""
    return _h64(canonical_url.encode("utf-8"), person=b"lsr-url!")


def host_hash64(host: str) -> int:
    """Stable 64-bit hash of a host (partitioning key: hash(host) % P)."""
    return _h64(host.encode("utf-8"), person=b"lsr-host")


def outlink_order_key(parent_order_key: int, pos: int) -> int:
    """Deterministic order key for the ``pos``-th outlink of a fetched page.

    The frontier's total tie-break order must be computable PER ROW on both
    the single-process oracle and the distributed engine (no global counter —
    a counter would serialize the distributed frontier update;
    SURVEY.md §7.3 "ordering is computed, never observed").  Seeds use their
    ``seed_order`` directly (reference semantics: input order,
    /root/reference/scripts/run.py:63); discovered links get a stable 63-bit
    key derived from (parent key, link position) with the top bit set so
    discovered URLs always tie-break after seeds.
    """
    h = _h64(f"{parent_order_key}:{pos}".encode(), person=b"lsr-okey")
    return (h & ((1 << 62) - 1)) | (1 << 62)  # bit 62 set; fits in int64
