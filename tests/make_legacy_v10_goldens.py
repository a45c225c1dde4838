"""Add legacy Step1 v10 goldens (``step1_v10.txt``) to the existing golden
fixture dirs by running the reference CLI
/root/reference/text-processing/legacy/Step1_ocr_cleanup_v10.py directly.

Usage: python tests/make_legacy_v10_goldens.py   (rerun only with
make_goldens.py, i.e. when the fixture generator changes).
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"
REF = "/root/reference/text-processing/legacy/Step1_ocr_cleanup_v10.py"


def main() -> None:
    for doc_dir in sorted(GOLDEN.iterdir()):
        inp = doc_dir / "input.txt"
        if not inp.is_file():
            continue
        subprocess.run(
            [sys.executable, REF, str(inp), str(doc_dir / "step1_v10.txt")],
            check=True, capture_output=True,
        )
        print(doc_dir.name)


if __name__ == "__main__":
    main()
