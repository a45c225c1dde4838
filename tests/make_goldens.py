"""Produce golden files by running the reference Step1→2→3 CLIs directly.

Usage:  python tests/make_goldens.py

Writes, for each fixture document, under ``tests/golden/doc_<i>/``:
    input.txt  step1.txt  step2.txt  step3.txt  step1.log.json  step2.log.json

Goldens are committed so the test suite never needs /root/reference at
runtime; rerun this script only to regenerate after changing the fixture
generator.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.sources.synth import make_document_text  # noqa: E402

REF = pathlib.Path("/root/reference/text-processing")
GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"

N_FIXTURES = 24
SEED = 42


def run_reference(doc_dir: pathlib.Path) -> None:
    inp = doc_dir / "input.txt"
    s1, s2, s3 = doc_dir / "step1.txt", doc_dir / "step2.txt", doc_dir / "step3.txt"
    subprocess.run(
        [sys.executable, str(REF / "Step1_ocr_cleanup_v11.py"), str(inp), str(s1),
         "--log", str(doc_dir / "step1.log.json")],
        check=True, capture_output=True,
    )
    subprocess.run(
        [sys.executable, str(REF / "Step2_formatting_v14.py"), str(s1), str(s2),
         "--log", str(doc_dir / "step2.log.json")],
        check=True, capture_output=True,
    )
    subprocess.run(
        [sys.executable, str(REF / "Step3_structuring_v1.py"), str(s2), str(s3)],
        check=True, capture_output=True,
    )


def main() -> None:
    GOLDEN.mkdir(parents=True, exist_ok=True)
    for i in range(N_FIXTURES):
        doc_dir = GOLDEN / f"doc_{i:02d}"
        doc_dir.mkdir(exist_ok=True)
        text = make_document_text(i, seed=SEED)
        (doc_dir / "input.txt").write_text(text, encoding="utf-8")
        run_reference(doc_dir)
        print(f"golden {doc_dir.name}: in={len(text)}b")

    # Edge-case fixtures exercising specific reference quirks.
    edge_cases = {
        "edge_empty": "",
        "edge_blank": "\n\n\n",
        "edge_no_chapters": "just a single line of prose with no structure at all.\n",
        "edge_mojibake": (
            'VOLUME 3\n\nCHAPTER I\n\nThe word Ã©tÃ© and the town ChambÃ©ry '
            'and a bullet â€¢ plus bare â artifacts Â« here Â».\n'
            'Superscripts¹ and² footnotes³ everywhere.\n'
        ),
        "edge_dialogue": (
            'CHAPTER I\n\nTHE OPENING SCENE was quiet.\n\n'
            '"Where is he?" "I cannot say." He left.\n\n"\n\n'
            '\' "Mixed artifacts." \'\n\nShe said, " come in" and \'\' done.\n'
        ),
        "edge_headers": (
            "Volume 4\nHistory of My Life\n17\n\nchapter one running head\n\n"
            "Real body text stays right here with lowercase letters.\n\n"
            "CHAPTER II\n\nANOTHER DAY BEGAN and so did we.\n\n"
            "12\nVolume 4\n•\n\nMore body follows after the break.\n"
        ),
        "edge_numbers": (
            "CHAPTER I\n\nHE GAVE ME 100 ducats and also 55 without reason.\n"
            "It was the year 1760 and the 2nd of May.\n"
            "A noted fact 12 appears, 34 mid-list and glued99 to a word.\n"
        ),
        "edge_wraps": (
            "CHAPTER I\n\nI WALKED ON and the evening came down very grad-\n"
            "ually over the lagoon while the last gondo-\nLiers sang.\n"
            "A soft­\nhyphen joins fully.\n"
        ),
        "edge_inline_chapter": (
            "Front matter then CHAPTER I begins inline here\n"
            "CHAPTER II has a tail after the numeral\n\nBody lines.\n"
        ),
    }
    for name, text in edge_cases.items():
        doc_dir = GOLDEN / name
        doc_dir.mkdir(exist_ok=True)
        (doc_dir / "input.txt").write_text(text, encoding="utf-8")
        run_reference(doc_dir)
        print(f"golden {name}: in={len(text)}b")


if __name__ == "__main__":
    main()
