"""Config-layer helpers — the reference's admission-configuration parsing.

F10 of SURVEY.md §2.7: size-string parsing. Exact semantics of
``BulkUploadService.parseMaxFileSize`` (BulkUploadService.java:222-244):
MB/KB/GB suffixes with binary (1024) multiples, bare numbers are bytes,
null/blank/unparseable fall back to the 50 MB default (with a warning in
the reference; silently here — the fallback IS the observable contract).
Used to gate document admission alongside the content-type check (P8).
"""

from __future__ import annotations

DEFAULT_MAX_FILE_SIZE = 50 * 1024 * 1024  # the reference's 50MB default


def parse_size(size_config: str | None) -> int:
    """'100MB' → bytes; '128KB', '2GB', bare-byte strings; default on junk."""
    try:
        if size_config is None or not size_config.strip():
            return DEFAULT_MAX_FILE_SIZE
        if size_config.endswith("MB"):
            return int(size_config[:-2]) * 1024 * 1024
        if size_config.endswith("KB"):
            return int(size_config[:-2]) * 1024
        if size_config.endswith("GB"):
            return int(size_config[:-2]) * 1024 * 1024 * 1024
        return int(size_config)
    except ValueError:
        return DEFAULT_MAX_FILE_SIZE
