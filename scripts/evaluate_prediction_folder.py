#!/usr/bin/env python
"""Re-score an existing prediction folder
(mirrors python_scripts/evaluate_prediction_folder.py).

    python scripts/evaluate_prediction_folder.py <folder> [outdir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diner_tpu.utils.platform import respect_env_platform
respect_env_platform()  # JAX_PLATFORMS=cpu must win over plugin pins

from diner_tpu.evaluation import evaluate_folder  # noqa: E402


def main():
    folder = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else folder
    print(evaluate_folder(folder, out))


if __name__ == "__main__":
    main()
