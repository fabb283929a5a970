"""Offline tests for the Multiface downloader's pure parts
(parse/filter/checksum/extract; network fetch is not exercised)."""

import hashlib
import sys
import tarfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import download_multiface as dm


INDEX = """
<html><body>
<a href="https://x/E001_images.tar">a</a>
<a href="https://x/E002_images.tar">b</a>
<a href="https://x/E001_unwrapped_uv.tar">c</a>
<a href="https://x/E001_tracked_mesh.tar">d</a>
<a href="https://x/audio.tar">e</a>
<a href="https://x/metadata.tar">f</a>
<a href="https://x/CHECKSUM">g</a>
</body></html>
"""


def test_parse_and_filter():
    hrefs = dm.parse_index(INDEX)
    assert len(hrefs) == 7
    cfg = {"image": True, "texture": False, "mesh": True, "audio": False,
           "metadata": True, "expression": ["E001"]}
    picked = [h.split("/")[-1] for h in dm.select_files(hrefs, cfg)]
    # E002 excluded by expression, uv by texture=False, audio by audio=False
    assert picked == ["E001_images.tar", "E001_tracked_mesh.tar",
                      "metadata.tar", "CHECKSUM"]


def test_checksum_and_extract(tmp_path):
    payload = tmp_path / "inner.txt"
    payload.write_text("hello multiface")
    tar_path = tmp_path / "entityE001_images.tar"
    with tarfile.open(tar_path, "w") as tf:
        tf.add(payload, arcname="images/inner.txt")

    good_md5 = hashlib.md5(tar_path.read_bytes()).hexdigest()
    checks = tmp_path / "CHECKSUM"
    checks.write_text(f"{good_md5}  E001_images.tar\n"
                      f"{'0' * 32}  E999_other.tar\n")
    excluded = dm.verify_checksums([tar_path], checks)
    assert excluded == []

    # corrupt → excluded
    checks.write_text(f"{'0' * 32}  E001_images.tar\n")
    assert dm.verify_checksums([tar_path], checks) == [tar_path]

    assert dm.extract_tar(tar_path, retries=2)
    assert (tmp_path / "images" / "inner.txt").read_text() == \
        "hello multiface"
    assert not tar_path.exists()
    assert tar_path.with_suffix(".tar.unzip").exists()


def test_extract_bounded_retry(tmp_path):
    bad = tmp_path / "broken.tar"
    bad.write_bytes(b"not a tar at all")
    assert not dm.extract_tar(bad, retries=3)
    assert bad.exists()  # not deleted on failure
