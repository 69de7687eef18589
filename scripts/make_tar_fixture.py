#!/usr/bin/env python3
"""Generate src/test/resources/fixtures/webdataset{,_pax}.tar — foreign
(python-tarfile-written) WebDataset shards for TarSource's pure-JDK
reader: one plain ustar archive and one PAX archive (whose extended
'x' headers the reader must skip). Regenerate with:
python3 scripts/make_tar_fixture.py
"""
import io
import os
import tarfile

OUT_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "fixtures")

SAMPLES = [
    ("000001", {"txt": b"hello webdataset", "cls": b"7"}),
    ("000002", {"txt": b"second sample with more text", "cls": b"3"}),
    ("000003", {"txt": b"", "cls": b"0"}),  # empty payload edge case
]


def build(path, fmt):
    with tarfile.open(path, "w", format=fmt) as tar:
        for key, files in SAMPLES:
            for ext in sorted(files):
                data = files[ext]
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0
                tar.addfile(info, io.BytesIO(data))


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    build(os.path.join(OUT_DIR, "webdataset.tar"), tarfile.USTAR_FORMAT)
    build(os.path.join(OUT_DIR, "webdataset_pax.tar"), tarfile.PAX_FORMAT)
    print("wrote webdataset.tar + webdataset_pax.tar")


if __name__ == "__main__":
    main()
