"""HTTP streaming source with retry (reference S1/S2).

Spark has no built-in HTTP source; like the reference, the fetch is a
driver-side streamed download to a path Spark can then scan (reference
main.py:135-171 streams in 8 MiB chunks; main.py:93-132 wraps it in a
3-retry/10 s-sleep loop).  At cluster scale the destination should be object
storage so executors scan splits in parallel; locally it is a temp file.

Executor-side read retries are separate and engine-provided
(``spark.task.maxFailures``); this loop only protects the one driver fetch.
"""

from __future__ import annotations

import logging
import os
import tempfile
import time
import urllib.request

logger = logging.getLogger(__name__)

CHUNK_SIZE = 8 * 1024 * 1024  # 8 MiB, matching reference main.py:159


class DownloadError(RuntimeError):
    pass


def download_to_path(
    url: str,
    dest_path: str | None = None,
    chunk_size: int = CHUNK_SIZE,
    timeout: float = 60.0,
) -> str:
    """Stream ``url`` to ``dest_path`` (or a new temp file) in bounded-memory
    chunks; returns the path."""
    if dest_path is None:
        fd, dest_path = tempfile.mkstemp(prefix="slr_download_", suffix=".csv")
        os.close(fd)
    logger.info("downloading %s -> %s", url, dest_path)
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        with open(dest_path, "wb") as out:
            while True:
                chunk = resp.read(chunk_size)
                if not chunk:
                    break
                out.write(chunk)
    size_mb = os.path.getsize(dest_path) // (1024 * 1024)
    logger.info("downloaded %d MB", size_mb)
    return dest_path


def download_with_retry(
    url: str,
    dest_path: str | None = None,
    max_retries: int = 3,
    sleep_seconds: float = 10.0,
    chunk_size: int = CHUNK_SIZE,
) -> str:
    """Retry wrapper, semantics of reference main.py:93-132: up to
    ``max_retries`` attempts, fixed sleep between, raise after the last."""
    last_exc: Exception | None = None
    for attempt in range(1, max_retries + 1):
        try:
            return download_to_path(url, dest_path, chunk_size=chunk_size)
        except Exception as exc:  # noqa: BLE001 - mirror reference's broad retry
            last_exc = exc
            logger.warning("download attempt %d/%d failed: %s", attempt, max_retries, exc)
            if attempt < max_retries:
                time.sleep(sleep_seconds)
    raise DownloadError(f"download failed after {max_retries} attempts: {url}") from last_exc
