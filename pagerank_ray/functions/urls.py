"""URL normalization (SURVEY.md §2.8 [NORTH]).

Deterministic, stdlib-only: lowercase scheme + host, strip fragment, keep
path/query/port verbatim. Applied to page urls and outlink targets before
id assignment so `src ∪ dst` vertices unify on one canonical form.
"""

from __future__ import annotations

import functools
from urllib.parse import urlsplit, urlunsplit


@functools.lru_cache(maxsize=1 << 17)
def normalize_url(url: str) -> str:
    """Memoized: crawl outlinks repeat the same target urls heavily, and the
    urlsplit/urlunsplit pair is ~4 µs — a cache hit is ~20× cheaper."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    netloc = parts.netloc
    # lowercase only the host, preserving any userinfo/port verbatim
    if "@" in netloc:
        userinfo, _, hostport = netloc.rpartition("@")
        netloc = userinfo + "@" + hostport.lower()
    else:
        netloc = netloc.lower()
    return urlunsplit((parts.scheme.lower(), netloc, parts.path, parts.query, ""))
