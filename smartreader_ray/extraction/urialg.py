"""URI algebra for link absolutization.

Semantics follow the reference's ``UriExtensions.cs:9-76`` (GetBase,
GetPathBase, ToAbsoluteURI: hash/data/scheme-rooted/dot-slash cases) built
on ``urllib.parse`` — behavior, not code, is mirrored.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

_ABSOLUTE_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:\S+$")
_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}


class PageUri:
    """Parsed base URI of a page (reference ``System.Uri`` surface subset)."""

    __slots__ = ("raw", "scheme", "userinfo", "host", "port", "path", "query")

    def __init__(self, uri: str):
        self.raw = uri
        parts = urlsplit(uri)
        self.scheme = parts.scheme or "https"
        self.userinfo = ""
        netloc = parts.netloc
        if "@" in netloc:
            self.userinfo, netloc = netloc.rsplit("@", 1)
        if ":" in netloc:
            host, port_s = netloc.rsplit(":", 1)
            try:
                self.port = int(port_s)
            except ValueError:
                host, self.port = netloc, None
            else:
                netloc = host
        else:
            self.port = None
        self.host = netloc
        self.path = parts.path or "/"
        self.query = parts.query

    @property
    def is_default_port(self) -> bool:
        return self.port is None or _DEFAULT_PORTS.get(self.scheme) == self.port

    @property
    def path_and_query(self) -> str:
        return self.path + (("?" + self.query) if self.query else "")

    def get_base(self) -> str:
        out = [self.scheme, "://"]
        if self.userinfo:
            out.append(self.userinfo)
            out.append("@")
        out.append(self.host)
        if not self.is_default_port:
            out.append(":")
            out.append(str(self.port))
        return "".join(out)

    def get_path_base(self) -> str:
        return self.get_base() + self.path[: self.path.rfind("/") + 1]

    def to_absolute_uri(self, uri_to_check: str) -> str:
        scheme = self.scheme
        pre_path = self.get_base()
        path_base = self.get_path_base()

        if len(uri_to_check) == 0:
            return path_base
        if is_well_formed_absolute(uri_to_check):
            return uri_to_check
        if uri_to_check[0] == "#":
            return uri_to_check
        if uri_to_check.startswith("//"):
            return scheme + "://" + uri_to_check[2:]
        if uri_to_check[0] == "/":
            return pre_path + uri_to_check
        if uri_to_check.startswith("./"):
            return path_base + uri_to_check[2:]
        if uri_to_check.startswith("data:"):
            return uri_to_check
        return path_base + uri_to_check


def is_well_formed_absolute(uri: str) -> bool:
    """Approximation of ``Uri.IsWellFormedUriString(s, Absolute)``: an
    absolute scheme:… URI with no spaces or unescaped structural chars.

    .NET's Uri parser strips leading/trailing whitespace and embedded
    ``\\r \\n \\t`` before validating — mirror that (validation only; the
    caller still returns the original string untouched)."""
    candidate = uri.strip().replace("\r", "").replace("\n", "").replace("\t", "")
    if not _ABSOLUTE_RE.match(candidate):
        return False
    # .NET rejects strings with illegal chars such as spaces, <, >, "
    return not any(c in candidate for c in ' <>"{}|^`\\')


def normalize_url(url: str) -> str:
    """RFC 3986 §6 syntax-based normalization (the SQL-replayable
    subset) — the canonical key for URL-level dedup of crawl frontiers:

    - scheme and host lowercased (case-insensitive per §3.1/§3.2.2)
    - fragment dropped (never sent to the server)
    - default port removed (http:80 / https:443 / ftp:21)
    - empty path → "/"
    - query preserved verbatim (reordering params changes semantics)
    - userinfo preserved verbatim

    Unparseable or non-absolute input normalizes to itself stripped —
    a dedup key must be total, never raise mid-pipeline."""
    try:
        parts = urlsplit((url or "").strip())
    except ValueError:
        return (url or "").strip()
    if not parts.scheme or not parts.netloc:
        return (url or "").strip()
    scheme = parts.scheme.lower()
    netloc = parts.netloc
    userinfo = ""
    if "@" in netloc:
        userinfo, netloc = netloc.rsplit("@", 1)
        userinfo += "@"
    host, port = netloc, ""
    if ":" in netloc:
        host, port = netloc.rsplit(":", 1)
    host = host.lower()
    if port and port.isdigit() and int(port) != _DEFAULT_PORTS.get(scheme):
        host = f"{host}:{port}"
    path = parts.path or "/"
    out = f"{scheme}://{userinfo}{host}{path}"
    if parts.query:
        out += f"?{parts.query}"
    return out
