"""Add legacy Step2 v13 goldens (``step2_v13.txt``, computed from the
committed step1.txt) to the golden fixture dirs via the reference CLI.

Usage: python tests/make_legacy_v13_goldens.py (rerun with make_goldens.py).
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"
REF = "/root/reference/text-processing/legacy/Step2_formatting1_v13.py"


def main() -> None:
    for doc_dir in sorted(GOLDEN.iterdir()):
        s1 = doc_dir / "step1.txt"
        if not s1.is_file():
            continue
        subprocess.run(
            [sys.executable, REF, str(s1), str(doc_dir / "step2_v13.txt")],
            check=True, capture_output=True,
        )
        print(doc_dir.name)


if __name__ == "__main__":
    main()
