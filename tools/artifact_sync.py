#!/usr/bin/env python
"""Content-addressed artifact versioning — the framework-local stand-in for
the reference's DVC layer (reference .dvc/config:1-5, data.dvc / weights.dvc
/ report.dvc pointers to a DagsHub S3 remote).

The reference versions three artifact dirs (data/ 10.1GB, weights/ 235MB,
report/ 1.88GB) as DVC pointers; `dvc pull/push` moves content. Here the
same contract is a tiny manifest + store:

  push <dir>   hash every file (sha256), copy new blobs into the store
               (FOOD101_SR_ARTIFACT_STORE or --store), write
               <dir>.manifest.json (the committable pointer — the .dvc
               analogue)
  pull <dir>   restore the dir from its manifest + store
  status <dir> diff the working dir against its manifest

The store layout is content-addressed (store/ab/cdef...), so pushes are
deduplicated and a GCS/NFS mount works as a shared remote on TPU VMs.
DVC itself remains drop-in usable instead (nothing here conflicts); this
tool exists so the capability works in hermetic images without dvc/dvc-s3.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys

DEFAULT_STORE = os.environ.get("FOOD101_SR_ARTIFACT_STORE", ".artifact_store")


def _hash_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _walk(dir_path: str):
    for root, _, files in os.walk(dir_path):
        for name in sorted(files):
            full = os.path.join(root, name)
            yield os.path.relpath(full, dir_path), full


def _manifest_path(dir_path: str) -> str:
    return dir_path.rstrip("/") + ".manifest.json"


def _blob_path(store: str, digest: str) -> str:
    return os.path.join(store, digest[:2], digest[2:])


def push(dir_path: str, store: str) -> dict:
    entries = {}
    n_new = 0
    for rel, full in _walk(dir_path):
        digest = _hash_file(full)
        size = os.path.getsize(full)
        entries[rel] = {"sha256": digest, "size": size}
        blob = _blob_path(store, digest)
        if not os.path.exists(blob):
            os.makedirs(os.path.dirname(blob), exist_ok=True)
            shutil.copy2(full, blob)
            n_new += 1
    manifest = {
        "dir": os.path.basename(dir_path.rstrip("/")),
        "nfiles": len(entries),
        "nbytes": sum(e["size"] for e in entries.values()),
        "files": entries,
    }
    with open(_manifest_path(dir_path), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"pushed {len(entries)} files ({manifest['nbytes']} B), "
          f"{n_new} new blobs -> {store}")
    return manifest


def pull(dir_path: str, store: str) -> None:
    with open(_manifest_path(dir_path)) as f:
        manifest = json.load(f)
    restored = 0
    for rel, meta in manifest["files"].items():
        dst = os.path.join(dir_path, rel)
        if os.path.exists(dst) and _hash_file(dst) == meta["sha256"]:
            continue
        blob = _blob_path(store, meta["sha256"])
        if not os.path.exists(blob):
            sys.exit(f"missing blob for {rel} ({meta['sha256'][:12]}...) "
                     f"in store {store}")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(blob, dst)
        restored += 1
    print(f"pulled {restored} files into {dir_path} "
          f"({manifest['nfiles']} tracked)")


def status(dir_path: str) -> int:
    try:
        with open(_manifest_path(dir_path)) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        print(f"no manifest for {dir_path}")
        return 2
    tracked = manifest["files"]
    current = {rel: full for rel, full in _walk(dir_path)}
    changed = [r for r in tracked if r in current
               and _hash_file(current[r]) != tracked[r]["sha256"]]
    missing = [r for r in tracked if r not in current]
    untracked = [r for r in current if r not in tracked]
    for label, items in (("changed", changed), ("missing", missing),
                         ("untracked", untracked)):
        for r in items:
            print(f"{label}: {r}")
    clean = not (changed or missing or untracked)
    print("clean" if clean else
          f"{len(changed)} changed, {len(missing)} missing, "
          f"{len(untracked)} untracked")
    return 0 if clean else 1


def gc(dirs, store: str) -> int:
    """Delete store blobs referenced by none of the given manifests (the
    `dvc gc -w` analogue). Pass EVERY tracked dir — blobs that only older
    manifest revisions reference are collected."""
    referenced = set()
    for d in dirs:
        try:
            with open(_manifest_path(d)) as f:
                manifest = json.load(f)
        except FileNotFoundError:
            # the one destructive subcommand fails loudly-but-friendly: a
            # typo'd dir must not silently shrink the kept set
            sys.exit(f"gc: no manifest for {d!r} ({_manifest_path(d)}); "
                     f"pass every pushed dir (nothing was deleted)")
        for meta in manifest["files"].values():
            referenced.add(meta["sha256"])
    removed = kept = 0
    for sub in (os.listdir(store) if os.path.isdir(store) else []):
        subdir = os.path.join(store, sub)
        if len(sub) != 2 or not os.path.isdir(subdir):
            continue
        for name in os.listdir(subdir):
            if sub + name in referenced:
                kept += 1
            else:
                os.remove(os.path.join(subdir, name))
                removed += 1
        if not os.listdir(subdir):
            os.rmdir(subdir)
    print(f"gc: removed {removed} blob(s), kept {kept}")
    return removed


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("command", choices=["push", "pull", "status", "gc"])
    p.add_argument("dir", nargs="+",
                   help="tracked dir (gc accepts several: every manifest "
                        "whose blobs must be kept)")
    p.add_argument("--store", default=DEFAULT_STORE)
    a = p.parse_args(argv)
    if a.command != "gc" and len(a.dir) != 1:
        p.error(f"{a.command} takes exactly one dir")
    if a.command == "push":
        push(a.dir[0], a.store)
    elif a.command == "pull":
        pull(a.dir[0], a.store)
    elif a.command == "gc":
        gc(a.dir, a.store)
    else:
        sys.exit(status(a.dir[0]))


if __name__ == "__main__":
    main()
