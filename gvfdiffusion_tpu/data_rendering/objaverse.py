"""Objaverse v1 + Objaverse-XL download handlers for the data farm.

Capability re-design of the reference's vendored downloaders
(data_rendering/objaverse/__init__.py:20-196 for v1;
data_rendering/objaverse/xl/{github,sketchfab,smithsonian,thingiverse}.py for
XL) with one shared cache/fetch core instead of four copies:

  ObjaverseV1     uids/annotations/objects from the allenai/objaverse HF
                  dataset layout (metadata shards ddd-ddd.json.gz,
                  object-paths.json.gz, glbs/<dir>/<uid>.glb)
  Objaverse-XL    per-source handlers keyed on the XL annotation records
                  (fileIdentifier/source/sha256): GitHub raw-at-commit,
                  Sketchfab (= v1 uids), Smithsonian direct GLB,
                  Thingiverse file endpoints

Every handler separates URL/cache-path construction (pure, unit-tested
offline) from fetching. Fetching uses urllib by default and accepts an
injected `fetcher(url, dest)` so the farm can route through mirrors/proxies
— and so tests exercise the full download path without network. Downloads go
to <dest>.tmp then rename (atomic against concurrent workers), verify sha256
when the manifest carries one, and skip files already cached.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterable, List, Optional, Sequence

Fetcher = Callable[[str, str], None]

_V1_HF = "https://huggingface.co/datasets/allenai/objaverse/resolve/main"


def _urllib_fetcher(url: str, dest: str) -> None:
    urllib.request.urlretrieve(url, dest)  # pragma: no cover (zero egress)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _fetch_atomic(url: str, dest: str, fetcher: Fetcher,
                  sha256: Optional[str] = None) -> str:
    if os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".tmp"
    fetcher(url, tmp)
    if sha256 is not None:
        got = _sha256(tmp)
        if got != sha256:
            os.remove(tmp)
            raise IOError(f"sha256 mismatch for {url}: {got} != {sha256}")
    os.replace(tmp, dest)
    return dest


class ObjaverseV1:
    """allenai/objaverse (v1) handler (reference objaverse/__init__.py)."""

    def __init__(self, cache_dir: str = "~/.objaverse/hf-objaverse-v1",
                 fetcher: Fetcher = _urllib_fetcher):
        self.root = os.path.expanduser(cache_dir)
        self.fetch = fetcher

    # -- layout (pure) --
    def metadata_shard_url(self, dir_id: str) -> str:
        return f"{_V1_HF}/metadata/{dir_id}.json.gz"

    def object_url(self, object_path: str) -> str:
        return f"{_V1_HF}/{object_path}"

    @staticmethod
    def all_shard_ids() -> List[str]:
        return [f"{i // 1000:03d}-{i % 1000:03d}" for i in range(160)]

    # -- manifest --
    def load_object_paths(self) -> Dict[str, str]:
        """uid -> repo-relative path (glbs/<shard>/<uid>.glb)."""
        dest = os.path.join(self.root, "object-paths.json.gz")
        _fetch_atomic(f"{_V1_HF}/object-paths.json.gz", dest, self.fetch)
        with gzip.open(dest, "rb") as f:
            return json.load(f)

    def load_uids(self) -> List[str]:
        return list(self.load_object_paths().keys())

    def load_annotations(self, uids: Optional[Sequence[str]] = None) -> Dict:
        paths = self.load_object_paths() if uids is not None else None
        shard_ids = (
            sorted({paths[u].split("/")[1] for u in uids})
            if uids is not None else self.all_shard_ids()
        )
        out: Dict[str, dict] = {}
        for sid in shard_ids:
            dest = os.path.join(self.root, "metadata", f"{sid}.json.gz")
            _fetch_atomic(self.metadata_shard_url(sid), dest, self.fetch)
            with gzip.open(dest, "rb") as f:
                data = json.load(f)
            if uids is not None:
                data = {u: data[u] for u in uids if u in data}
            out.update(data)
            if uids is not None and len(out) == len(uids):
                break
        return out

    def load_objects(self, uids: Sequence[str],
                     processes: int = 1) -> Dict[str, str]:
        """Download (or reuse cached) GLBs; returns uid -> local path."""
        paths = self.load_object_paths()
        jobs = [(u, paths[u]) for u in uids]

        def one(job):
            uid, rel = job
            return uid, _fetch_atomic(
                self.object_url(rel), os.path.join(self.root, rel), self.fetch
            )

        if processes <= 1:
            return dict(one(j) for j in jobs)
        with ThreadPoolExecutor(processes) as ex:
            return dict(ex.map(one, jobs))

    def load_lvis_annotations(self) -> Dict[str, List[str]]:
        dest = os.path.join(self.root, "lvis-annotations.json.gz")
        _fetch_atomic(f"{_V1_HF}/lvis-annotations.json.gz", dest, self.fetch)
        with gzip.open(dest, "rb") as f:
            return json.load(f)


# -- Objaverse-XL -------------------------------------------------------------


class XLHandler:
    """One XL source (reference objaverse/xl/abstract.py contract):
    `object_url(record)` is pure; `download(records)` fetches + verifies."""

    source = "base"

    def __init__(self, cache_dir: str = "~/.objaverse/xl",
                 fetcher: Fetcher = _urllib_fetcher):
        self.root = os.path.expanduser(cache_dir)
        self.fetch = fetcher

    def object_url(self, record: Dict) -> str:
        raise NotImplementedError

    def local_path(self, record: Dict) -> str:
        ident = record["fileIdentifier"]
        name = hashlib.sha1(ident.encode()).hexdigest()[:16]
        ext = os.path.splitext(urllib.parse.urlparse(ident).path)[1] or ".bin"
        return os.path.join(self.root, self.source, name + ext)

    def download(self, records: Iterable[Dict],
                 processes: int = 1) -> Dict[str, str]:
        jobs = list(records)

        def one(rec):
            return rec["fileIdentifier"], _fetch_atomic(
                self.object_url(rec), self.local_path(rec), self.fetch,
                sha256=rec.get("sha256"),
            )

        if processes <= 1:
            return dict(one(r) for r in jobs)
        with ThreadPoolExecutor(processes) as ex:
            return dict(ex.map(one, jobs))


class GitHubXL(XLHandler):
    """fileIdentifier = https://github.com/<org>/<repo>/blob/<commit>/<path>;
    fetch the raw blob pinned at that commit (reference xl/github.py)."""

    source = "github"

    def object_url(self, record: Dict) -> str:
        ident = record["fileIdentifier"]
        parts = urllib.parse.urlparse(ident)
        segs = parts.path.strip("/").split("/")
        if len(segs) < 5 or segs[2] != "blob":
            raise ValueError(f"not a github blob identifier: {ident}")
        org, repo, _, commit = segs[:4]
        path = "/".join(segs[4:])
        return (f"https://raw.githubusercontent.com/{org}/{repo}/"
                f"{commit}/{path}")

    def local_path(self, record: Dict) -> str:
        segs = urllib.parse.urlparse(
            record["fileIdentifier"]).path.strip("/").split("/")
        org, repo, _, commit = segs[:4]
        fname = segs[-1]
        return os.path.join(
            self.root, self.source, org, repo, commit[:12], fname)


class SketchfabXL(XLHandler):
    """Sketchfab XL records are the v1 uids (reference xl/sketchfab.py
    delegates to the hf-objaverse-v1 layout)."""

    source = "sketchfab"

    def __init__(self, cache_dir: str = "~/.objaverse/xl",
                 fetcher: Fetcher = _urllib_fetcher):
        super().__init__(cache_dir, fetcher)
        self.v1 = ObjaverseV1(os.path.join(cache_dir, "hf-objaverse-v1"),
                              fetcher)

    @staticmethod
    def uid_of(record: Dict) -> str:
        # fileIdentifier = https://sketchfab.com/3d-models/<slug>-<uid>
        return record["fileIdentifier"].rstrip("/").rsplit("-", 1)[-1]

    def download(self, records: Iterable[Dict],
                 processes: int = 1) -> Dict[str, str]:
        recs = list(records)
        uids = [self.uid_of(r) for r in recs]
        got = self.v1.load_objects(uids, processes)
        return {r["fileIdentifier"]: got[self.uid_of(r)] for r in recs}


class SmithsonianXL(XLHandler):
    """fileIdentifier is already the direct GLB URL (reference
    xl/smithsonian.py)."""

    source = "smithsonian"

    def object_url(self, record: Dict) -> str:
        return record["fileIdentifier"]


class ThingiverseXL(XLHandler):
    """fileIdentifier = https://www.thingiverse.com/thing:<id>/file:<fid>;
    fetch via the file-download endpoint (reference xl/thingiverse.py)."""

    source = "thingiverse"

    def object_url(self, record: Dict) -> str:
        ident = record["fileIdentifier"]
        fid = ident.rsplit("file:", 1)[-1]
        if not fid.isdigit():
            raise ValueError(f"not a thingiverse file identifier: {ident}")
        return f"https://www.thingiverse.com/download:{fid}"

    def local_path(self, record: Dict) -> str:
        ident = record["fileIdentifier"]
        thing = ident.split("thing:", 1)[-1].split("/", 1)[0]
        fid = ident.rsplit("file:", 1)[-1]
        return os.path.join(
            self.root, self.source, f"thing-{thing}", f"file-{fid}.stl")


HANDLERS = {
    "github": GitHubXL,
    "sketchfab": SketchfabXL,
    "smithsonian": SmithsonianXL,
    "thingiverse": ThingiverseXL,
}


def download_xl(records: Sequence[Dict], cache_dir: str = "~/.objaverse/xl",
                processes: int = 4,
                fetcher: Fetcher = _urllib_fetcher) -> Dict[str, str]:
    """Dispatch XL annotation records (each with `source` + `fileIdentifier`
    [+ sha256]) to their handlers (reference download_xl.py / render_xl.py)."""
    by_src: Dict[str, List[Dict]] = {}
    for r in records:
        by_src.setdefault(r["source"].lower(), []).append(r)
    out: Dict[str, str] = {}
    for src, recs in by_src.items():
        if src not in HANDLERS:
            raise ValueError(f"unknown XL source {src!r}")
        h = HANDLERS[src](cache_dir, fetcher)
        out.update(h.download(recs, processes))
    return out
