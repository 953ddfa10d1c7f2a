"""Pure NumPy/Arrow batch kernels — no Ray dependency.

Each module is the code-dedup analog of a family of scalar/UDF functions in
the reference (see SURVEY.md §2.2/§2.8). All kernels are vectorized over
batches; none iterate Python rows in the hot path beyond C-speed per-row
regex/hash calls that have no vectorized equivalent.
"""
