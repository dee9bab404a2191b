"""CLI shim: ``python -m models.patch_cls_simple.predict <image> [weights]``
(the reference's broken predict.py, repaired — SURVEY.md §2b.4)."""

from deephisto_tpu.models.patch_cls_simple.predict import main

if __name__ == "__main__":
    main()
