#!/usr/bin/env python
"""Multiface dataset downloader (stdlib-only).

Parity target: ``deps/multiface/download_dataset.py`` — walks each entity's
S3 ``index.html``, filters tar files by asset kind + expression list from a
JSON config, downloads with bounded retries, verifies md5 against the
shipped CHECKSUM file, and extracts passing tars. Differences from the
reference: ``requests``/``BeautifulSoup``/``os.system`` are replaced by
``urllib``/``html.parser``/``hashlib``/``tarfile`` (no shell-outs), the
retry cap is configurable, and the reference's hardcoded
``/cluster/scratch/...`` destination (download_dataset.py:175) is not
replicated — ``--dest`` is honored.

    python scripts/download_multiface.py --dest data/MULTIFACE \
        --download_config configs/download_multiface.json
"""

import argparse
import hashlib
import json
import logging
import tarfile
from html.parser import HTMLParser
from pathlib import Path

MAX_TRY = 50
S3_ROOT = ("https://fb-baas-f32eacb9-8abb-11eb-b2b8-4857dd089e15"
           ".s3.amazonaws.com/MugsyDataRelease/v0.0/identities/")
MISC = {"CHECKSUM", "index.html"}

logging.basicConfig(level=logging.INFO)
log = logging.getLogger("multiface-download")


class _LinkParser(HTMLParser):
    def __init__(self):
        super().__init__()
        self.hrefs = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


def parse_index(html: str):
    """index.html → list of hrefs (reference: soup.find_all('a'))."""
    p = _LinkParser()
    p.feed(html)
    return p.hrefs


def select_files(hrefs, cfg):
    """Apply the reference's asset-kind + expression filters
    (download_dataset.py:109-132). Returns hrefs to fetch."""
    out = []
    for href in hrefs:
        name = href.split("/")[-1]
        if "unwrapped_uv" in name and not cfg.get("texture"):
            continue
        if "tracked_mesh" in name and not cfg.get("mesh"):
            continue
        if "images" in name and not cfg.get("image"):
            continue
        if "audio" in name and not cfg.get("audio"):
            continue
        if "metadata" in name and not cfg.get("metadata"):
            continue
        included = (name in MISC or "metadata" in name or "audio" in name
                    or any(exp in name for exp in cfg.get("expression", [])))
        if included:
            out.append(href)
    return out


def md5_file(path, chunk=1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while blk := f.read(chunk):
            h.update(blk)
    return h.hexdigest()


def verify_checksums(tar_files, checksum_path):
    """CHECKSUM lines '<md5>  <name>' → list of failing tar paths
    (download_dataset.py:48-79)."""
    by_name = {Path(t).name: t for t in tar_files}
    excluded = []
    for line in Path(checksum_path).read_text().splitlines():
        if not line.strip():
            continue
        code, tar_name = line.split()[0].strip(), line.split()[-1].strip()
        # the reference prefixes the entity when mapping names to paths
        matches = [p for n, p in by_name.items() if n.endswith(tar_name)]
        for path in matches:
            if md5_file(path) != code:
                log.info("File %s does not pass checksum!", path)
                excluded.append(path)
    return excluded


def extract_tar(path, retries: int = MAX_TRY) -> bool:
    """Bounded-retry extraction; marks success with <path>.unzip and removes
    the tar (download_dataset.py:23-38)."""
    path = Path(path)
    for _ in range(retries):
        try:
            with tarfile.open(path) as tf:
                tf.extractall(path.parent)
            path.with_suffix(path.suffix + ".unzip").touch()
            path.unlink()
            return True
        except Exception as e:  # corrupt read: retry
            log.info("Unzip %s failed (%s). Re-unzipping...", path, e)
    return False


def fetch(url, dest, retries: int = MAX_TRY) -> bool:
    """Bounded-retry download with a .download success marker."""
    from urllib.request import urlretrieve
    dest = Path(dest)
    marker = Path(str(dest) + ".download")
    if marker.exists():
        return True
    for _ in range(retries):
        try:
            urlretrieve(url, dest)
            marker.touch()
            return True
        except Exception as e:
            log.info("Download %s failed (%s). Re-downloading...", url, e)
    return False


def download_entity(entity: str, dest: Path, cfg: dict) -> bool:
    from urllib.request import urlopen
    url = S3_ROOT + entity + "/index.html"
    log.info("Start downloading entity %s....", entity)
    html = urlopen(url).read().decode("utf-8", "replace")
    hrefs = select_files(parse_index(html), cfg)

    tar_files, checksum_file = [], None
    for href in hrefs:
        name = href.split("/")[-1]
        path = dest / (entity + name)
        if not fetch(href, path):
            log.info("Giving up on %s", href)
            continue
        if "CHECKSUM" in name:
            checksum_file = path
        else:
            tar_files.append(path)

    excluded = (verify_checksums(tar_files, checksum_file)
                if checksum_file else [])
    for t in tar_files:
        if t not in excluded and str(t).endswith(".tar"):
            extract_tar(t)
    log.info("%s .tar extraction has completed", entity)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="data/MULTIFACE")
    ap.add_argument("--download_config", required=True)
    args = ap.parse_args()

    cfg = json.loads(Path(args.download_config).read_text())
    dest = Path(args.dest)
    dest.mkdir(parents=True, exist_ok=True)
    for entity in cfg["entity"]:
        download_entity(entity, dest, cfg)


if __name__ == "__main__":
    main()
