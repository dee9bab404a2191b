"""CLI shim: ``python -m models.patch_cls_simple.train [--extract_test]``
(reference entry point, README.md:27-28) → deephisto_tpu training program."""

from deephisto_tpu.models.patch_cls_simple.train import main

if __name__ == "__main__":
    main()
