"""Filesystem helpers: one URI-aware path layer for the whole pipeline.

``_list_parquet_files`` (pipeline.py) reads input through ``pyarrow.fs`` and
advertises file:/s3:/hdfs: support; the manifest/commit side must agree on
the supported filesystems instead of silently returning empty for non-local
out_dirs (ADVICE r2). Local paths keep plain ``os`` semantics (atomic
``os.replace`` commit); remote URIs go through ``pyarrow.fs``. Filesystems
without atomic rename (S3) refuse the *commit* operations loudly — an
object-store commit protocol needs a different visibility gate (e.g.
conditional PUT of the manifest record), and pretending rename is atomic
there would corrupt the wave-visibility invariant.
"""

from __future__ import annotations

import json
import os
import tempfile

_LOCAL_SCHEMES = ("", "file")


def _scheme(path: str) -> str:
    head, sep, _ = path.partition("://")
    return head if sep else ""


def is_local(path: str) -> bool:
    return _scheme(path) in _LOCAL_SCHEMES


def strip_file_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path


def get_fs(path: str):
    """(pyarrow FileSystem, root-path) for any supported URI."""
    from pyarrow import fs as pafs
    return pafs.FileSystem.from_uri(path)


def listdir(path: str) -> list[str]:
    """Base names of entries directly under ``path``; [] if absent."""
    if is_local(path):
        p = strip_file_scheme(path)
        return os.listdir(p) if os.path.isdir(p) else []
    from pyarrow import fs as pafs
    filesystem, root = get_fs(path)
    info = filesystem.get_file_info(root)
    if info.type != pafs.FileType.Directory:
        return []
    sel = pafs.FileSelector(root, recursive=False)
    return [f.base_name for f in filesystem.get_file_info(sel)]


def isdir(path: str) -> bool:
    """True iff ``path`` exists and is a directory (any scheme)."""
    if is_local(path):
        return os.path.isdir(strip_file_scheme(path))
    from pyarrow import fs as pafs
    filesystem, root = get_fs(path)
    return filesystem.get_file_info(root).type == pafs.FileType.Directory


def has_parquet_files(dir_path: str) -> bool:
    return any(n.endswith(".parquet") for n in listdir(dir_path))


def read_json(path: str) -> dict:
    if is_local(path):
        with open(strip_file_scheme(path)) as fh:
            return json.load(fh)
    filesystem, root = get_fs(path)
    with filesystem.open_input_stream(root) as fh:
        return json.loads(fh.read().decode())


def write_json_atomic(dir_path: str, name: str, obj: dict) -> None:
    """Write ``{dir_path}/{name}`` via temp-file + atomic rename — the wave
    commit point. Local and rename-capable remote filesystems only."""
    if is_local(dir_path):
        d = strip_file_scheme(dir_path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(prefix=f".{name}.", dir=d)
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, f"{d}/{name}")
        return
    if _scheme(dir_path) in ("s3", "s3a", "gs"):
        raise NotImplementedError(
            f"atomic manifest commit is not supported on "
            f"{_scheme(dir_path)}:// (no atomic rename); use a "
            f"rename-capable filesystem (file:/hdfs:) for out_dir")
    filesystem, root = get_fs(dir_path)
    filesystem.create_dir(root, recursive=True)
    tmp = f"{root}/.{name}.tmp"
    with filesystem.open_output_stream(tmp) as f:
        f.write(json.dumps(obj).encode())
    filesystem.move(tmp, f"{root}/{name}")
