"""Persisted trained-artifact store for quantizers (IVF centroids, PQ
codebooks).

A trained quantizer is an INDEX artifact, not a query intermediate:
re-fitting k-means per query would be like re-building a B-tree per
lookup, and an in-process memo dies with the process — the 100 TB shape
is centroids/codebooks written once as parquet next to the index and
read back by every later session. This module is that store, scoped to
a local directory (``SPARK_GRAFT_ARTIFACTS_DIR`` overrides; defaults
under the system temp dir so read-only data dirs are never touched).

Writes are atomic (build into a ``.tmp.<pid>`` sibling, ``os.rename``
into place); a concurrent loser just reads the winner's artifact. Keys
hash the full provenance (input file set + hyperparameters) and every
local file path in the key is expanded to a CONTENT fingerprint
(path, size, mtime_ns) before hashing — regenerating a fixture in
place therefore re-trains instead of silently reusing stale centroids.
The default root is per-user (uid-suffixed) so shared temp dirs never
collide on permissions.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def artifact_root() -> str:
    uid = os.getuid() if hasattr(os, "getuid") else "u"
    return os.environ.get(
        "SPARK_GRAFT_ARTIFACTS_DIR",
        os.path.join(tempfile.gettempdir(), f"spark_graft_artifacts_{uid}"),
    )


def _fingerprint(obj: object) -> object:
    """Recursively expand any local path string inside a key to
    (path, size, mtime_ns) so the cache key tracks file CONTENT identity,
    not just the name — a fixture regenerated in place gets a new key.
    Handles bare paths plus the ``file://``, ``file:///`` and Hadoop's
    single-slash ``file:/`` URI renderings; ``file://host/p`` with a
    non-empty remote host is NOT a local path and passes through
    untouched. DIRECTORY paths fingerprint over their top-level entries
    (sorted (name, size, mtime_ns)) — the dir inode's own mtime only
    moves on create/rename, so an in-place truncate/overwrite of a part
    file would otherwise reuse a stale artifact. Non-path values pass
    through untouched."""
    if isinstance(obj, (tuple, list)):
        return tuple(_fingerprint(x) for x in obj)
    if isinstance(obj, str):
        path = obj
        if path.startswith("file:"):
            rest = path[5:]
            if rest.startswith("//") and not rest.startswith("///"):
                host = rest[2:].split("/", 1)[0]
                if host not in ("", "localhost"):
                    return obj  # remote-host file URI — not a local path
                rest = rest[2 + len(host):]  # file://localhost/p -> /p
            path = rest
            # file:///p and file:/p both mean /p
            while path.startswith("//"):
                path = path[1:]
        if os.path.sep in path:
            if os.path.isfile(path):
                st = os.stat(path)
                return (path, st.st_size, st.st_mtime_ns)
            if os.path.isdir(path):
                entries = []
                for name in sorted(os.listdir(path)):
                    try:
                        st = os.stat(os.path.join(path, name))
                    except OSError:
                        continue
                    entries.append((name, st.st_size, st.st_mtime_ns))
                return (path, "dir", tuple(entries))
    return obj


def _key_path(kind: str, key: object) -> str:
    digest = hashlib.md5(repr(_fingerprint(key)).encode()).hexdigest()[:20]
    return os.path.join(artifact_root(), kind, digest)


def _atomic_publish(tmp: str, final: str) -> None:
    try:
        os.rename(tmp, final)
    except OSError:
        # a concurrent trainer won the rename — use its artifact
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(final):
            raise


def load_or_train_rows(
    kind: str,
    key: object,
    train: Callable[[], Sequence[tuple]],
    columns: Sequence[str],
) -> list[tuple]:
    """Driver-side row artifact (small by construction — centroid tables,
    codebooks). Returns the rows, training and persisting them as parquet
    on first use."""
    final = _key_path(kind, key)
    path = os.path.join(final, "artifact.parquet")
    if not os.path.exists(path):
        rows = [tuple(r) for r in train()]
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = f"{final}.tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        tbl = pa.table(
            {c: [r[i] for r in rows] for i, c in enumerate(columns)}
        )
        pq.write_table(tbl, os.path.join(tmp, "artifact.parquet"))
        _atomic_publish(tmp, final)
    tbl = pq.read_table(path)
    cols = [tbl.column(c).to_pylist() for c in columns]
    return [tuple(vals) for vals in zip(*cols)]


def load_or_train_codebooks(
    kind: str,
    key: object,
    train: Callable[[], list[np.ndarray]],
) -> list[np.ndarray]:
    """Codebook artifact: a list of (n_cent, sub_dim) float64 matrices,
    stored as one parquet of (sub, cid, cent) rows."""
    rows = load_or_train_rows(
        kind,
        key,
        lambda: [
            (s, c, [float(x) for x in cb[c]])
            for s, cb in enumerate(train())
            for c in range(cb.shape[0])
        ],
        ("sub", "cid", "cent"),
    )
    n_sub = max(r[0] for r in rows) + 1
    out: list[list] = [[] for _ in range(n_sub)]
    for s, c, cent in sorted(rows):
        assert c == len(out[s]), "codebook rows must be dense and ordered"
        out[s].append(cent)
    return [np.array(cb, dtype=np.float64) for cb in out]
