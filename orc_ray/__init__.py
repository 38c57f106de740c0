"""orc_ray — a Ray-Data-native per-column lightweight-compression engine.

From-scratch reimplementation of the query/data-processing capabilities of
the reference (olegz/orc, i.e. Apache ORC: per-column dictionary, RLEv2-style
integer encodings, frame-of-reference + bit-packing) plus FSST string
compression, expressed as streaming ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches.  See SURVEY.md for the structural analysis of the
reference this design derives from.

Layout:
  codecs/    pure numpy/arrow kernels (no Ray): bitpack, int block codec,
             dictionary, FSST, zstd block framing
  chunk.py   self-describing encoded-chunk format + per-column codec
             auto-selection (the analog of ORC's stripe + WriterImpl
             encoder selection, c++/src/ColumnWriter.cc)
  pipeline/  Ray Data encode/decode pipelines (map_batches actor pools,
             manifest-committed resumable output)
  state/     lineage manifest (the analog of ORC's footer-commits-the-file
             invariant at partition granularity)
"""

from . import _mem  # noqa: F401  (allocator tuning; see _mem.py)


def _quiet_data_context() -> None:
    """Turn off Ray Data's per-operator progress bars for this process.

    Driver-side UI a headless engine has no use for: on tty hosts with
    tqdm installed the bars cost rendering + stats plumbing per operator,
    and without tqdm Ray prints a per-session install nag.  Measured here
    (no tqdm, non-tty) the setting is timing-neutral — this is hygiene,
    not a performance lever.  Set ORC_RAY_PROGRESS=1 to keep Ray's
    default behavior (e.g. for interactive CLI sessions)."""
    import os

    if os.environ.get("ORC_RAY_PROGRESS", "0") not in ("", "0", "false"):
        return
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.enable_operator_progress_bars = False
    except Exception:
        pass  # ray.data absent/ancient: progress bars are cosmetic


_quiet_data_context()

__version__ = "0.1.0"
