"""Launcher shim: ``python run.py ...`` == the packaged CLI
(yolov3_tensorflow_tpu/cli.py, installed as ``yolov3-tpu``).  Kept at
the repo root to mirror the reference's run.py entry convention
(reference run.py:123)."""
from yolov3_tensorflow_tpu.cli import (build_config, main,  # noqa: F401
                                       predict, test, train)

if __name__ == "__main__":
    main()
