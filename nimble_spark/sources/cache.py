"""Write-once table cache keyed by source fingerprint.

Round-trip queries exercise the connector's write path, but rewriting
identical input on every run would only re-test the same bytes — so
written tables are cached under ``/tmp/nimble_spark_tables``. Two
hazards with a naive exists-check cache (both observed in review):

- **staleness**: if the source corpus is regenerated in place, the
  Spark side would read the stale cached copy while the DuckDB oracle
  reads the fresh parquet — a spurious differential failure. The cache
  key therefore embeds a fingerprint of each source file's
  (mtime_ns, size), so regenerated inputs get a fresh cache entry.
- **races**: check-then-write is racy when the differential harness
  and pytest run concurrently. Builders write into a private temp dir
  that is atomically ``rename(2)``-ed into place; the final directory
  exists if and only if the artifact is complete, and a lost race
  simply discards the duplicate build.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections.abc import Callable, Iterable

CACHE_ROOT = "/tmp/nimble_spark_tables"

# Manifest-layout generation: bump when the WRITER changes what a
# manifest records (r5: per-row-group rg_bytes/rg_rows + write_stats
# distributions; then the bucket-directory discovery fix that gives
# bucketed manifests their file entries) so cached tables built by an
# older writer rebuild instead of serving manifests missing the new
# fields. r6: null-count accounting fix — manifests built before r6
# can record nulls=0 for columns with all-null row groups (wrong
# IS NULL pruning), so they must rebuild. r11: delete-mask batches
# are visible only with their atomic commit marker (publish_mask_batch)
# — tables cached with pre-marker masks would silently resurrect
# deleted keys, so they must rebuild.
MANIFEST_GEN = 5


def source_fingerprint(sf_dir: str, tables: Iterable[str]) -> str:
    parts = []
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        st = os.stat(p)
        parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:10]


def cached_path(sf_dir: str, variant: str, tables: Iterable[str]) -> str:
    sf = sf_dir.rstrip("/").replace("/", "_")
    fp = source_fingerprint(sf_dir, tables)
    return os.path.join(CACHE_ROOT, f"{sf}__{variant}__g{MANIFEST_GEN}fp{fp}")


def ensure_cached(
    sf_dir: str,
    variant: str,
    tables: Iterable[str],
    build: Callable[[str], None],
) -> str:
    """Return the cache dir for (sf_dir, variant, source fingerprint),
    building it with ``build(tmp_path)`` + atomic rename if absent."""
    tables = list(tables)
    final = cached_path(sf_dir, variant, tables)
    if os.path.isdir(final):
        return final
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = f"{final}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    build(tmp)
    try:
        os.rename(tmp, final)
    except OSError:
        # a concurrent builder renamed first — its artifact is
        # complete (rename is atomic), keep it and drop ours
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(final):
            raise
    return final
