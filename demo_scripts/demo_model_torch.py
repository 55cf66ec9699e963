"""Duplicate of the top-level demo entry point — the reference ships
``demo_scripts/demo_model_torch.py`` as a byte-identical copy of its
``demo_model.py`` (SURVEY.md §2.2); we keep the name for capability parity
but delegate instead of duplicating."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demo_model import main  # noqa: E402

if __name__ == "__main__":
    main()
