"""Object-store seam discipline for the snapshot store (r10 verdict #8):

* ``_resolve_file`` must treat a scheme-prefixed table root
  (``s3a://bucket/table``) as a URI — plain '/' join, no
  ``os.path.abspath`` (which would mangle the scheme into a local
  path) — so a format-2 manifest re-mounted on an object store
  resolves without touching the local filesystem;
* an AST lint pins every filesystem-touching call in versioning.py to
  the designated seam functions, so future edits cannot scatter local
  I/O into resolution/plan code that an object-store deployment would
  need to keep pure.
"""

from __future__ import annotations

import ast
import inspect

from ssg_etl_spark.sources import versioning


def test_resolve_file_scheme_roots_join_as_uris():
    r = versioning._resolve_file
    # Format-2 relative entries attach to wherever the table lives now —
    # including an object-store mount; nothing here may touch the FS.
    assert (
        r("s3a://bucket/tbl", "data/v1-x/part.parquet")
        == "s3a://bucket/tbl/data/v1-x/part.parquet"
    )
    assert (
        r("gs://b/t/", "data/v2-y/p.parquet") == "gs://b/t/data/v2-y/p.parquet"
    )
    # Pass-throughs: absolute local entries (legacy format 1) and
    # already-qualified URIs.
    assert r("s3a://bucket/tbl", "/abs/old.parquet") == "/abs/old.parquet"
    assert r("/local/tbl", "s3a://b/x.parquet") == "s3a://b/x.parquet"
    # Local roots keep the absolute-path behavior.
    assert r("/local/tbl", "data/v1/p.parquet") == "/local/tbl/data/v1/p.parquet"


def test_manifest_files_resolve_under_scheme_root(tmp_path, spark):
    """End-to-end through the real seam: commit locally (format 2 writes
    relative entries), then read the manifest back and resolve its
    entries against a MOCK object-store root — every resolved path must
    live under the scheme prefix, proving resolution needs no local-FS
    semantics once the manifest bytes are in hand."""
    tbl = str(tmp_path / "tbl")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    v = versioning.commit_snapshot(df, tbl)
    entries = versioning._read_manifest(tbl, v)["files"]
    assert entries and all(not e.startswith("/") for e in entries)
    resolved = [
        versioning._resolve_file("s3a://corpus/tbl", e) for e in entries
    ]
    assert all(p.startswith("s3a://corpus/tbl/data/") for p in resolved)


# The seam: the ONLY functions allowed to perform filesystem I/O. An
# object-store deployment swaps exactly these (listing, HEAD, get/put,
# delete); everything else in the module must stay pure path/manifest
# logic. Frozen deliberately — extending it is a conscious API decision,
# not a drive-by.
_SEAM = {
    "_file_size",        # HEAD / stat
    "snapshot_versions",  # log listing
    "_read_manifest",     # manifest get
    "_publish_manifest",  # atomic manifest put
    "_data_files",        # data-dir listing
    "commit_snapshot",    # data put (spark write + dir prep)
    "vacuum_snapshots",   # the one destructive step: delete
}

_IO_CALLS = {
    ("os", "listdir"),
    ("os", "remove"),
    ("os", "unlink"),
    ("os", "replace"),
    ("os", "makedirs"),
    ("os", "fdopen"),
    ("os.path", "getsize"),
    ("os.path", "isdir"),
    ("os.path", "exists"),
    ("os.path", "isfile"),
    (None, "open"),
    ("tempfile", "mkstemp"),
    ("tempfile", "mkdtemp"),
    ("shutil", "rmtree"),
    ("shutil", "move"),
    ("shutil", "copy"),
}


def _dotted(node: ast.expr) -> str | None:
    parts = []
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if isinstance(node, ast.Name):
        parts.append(node.id)
        return ".".join(reversed(parts))
    return None


def test_no_filesystem_io_outside_the_seam():
    tree = ast.parse(inspect.getsource(versioning))
    offenders: list[tuple[str, str, int]] = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for node in ast.walk(fn):
            if not isinstance(node, ast.Call):
                continue
            name = _dotted(node.func)
            if name is None:
                continue
            hit = any(
                name == (f"{mod}.{attr}" if mod else attr)
                for mod, attr in _IO_CALLS
            )
            if hit and fn.name not in _SEAM:
                offenders.append((fn.name, name, node.lineno))
    assert not offenders, (
        "filesystem I/O outside the designated seam functions "
        f"{sorted(_SEAM)}: {offenders} — route it through a seam function "
        "or consciously extend the seam"
    )
    # The lint must actually see the seam's own I/O (guards against the
    # walker silently matching nothing).
    seen_in_seam = {
        fn.name
        for fn in ast.walk(tree)
        if isinstance(fn, ast.FunctionDef)
        and fn.name in _SEAM
        and any(
            isinstance(n, ast.Call)
            and _dotted(n.func)
            in {f"{m}.{a}" if m else a for m, a in _IO_CALLS}
            for n in ast.walk(fn)
        )
    }
    assert "snapshot_versions" in seen_in_seam
    assert "_publish_manifest" in seen_in_seam
