"""Experimental kernels: NOT on any production path.

Code here is kept for future hardware/toolchain revisions, with the measured
reason it is not production documented in each module. Import explicitly via
``deephisto_tpu.experimental.<module>``; nothing is re-exported at package
level on purpose.
"""
