"""Session/DataContext tuning for scale runs.

One place for the execution knobs every entrypoint (bench, job script, tests)
would otherwise duplicate. Call after `ray.init`; never calls `ray.init`
itself (the driver owns the session).
"""

from __future__ import annotations


def configure_for_scale(target_max_block_size_mb: int = 128,
                        preserve_order: bool = False,
                        progress_bars: bool = False) -> None:
    """Set the DataContext the way the 100 TB design assumes:

    - block size bounds batch × concurrency memory (wide nested prediction
      columns want ≤128 MiB blocks);
    - order preservation OFF — every pipeline here is row-order-free by
      design (documents are self-contained rows; counts/joins key-based), and
      preserve_order serializes the streaming executor;
    - progress bars off for headless runs.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_size_mb * 1024 * 1024
    ctx.execution_options.preserve_order = preserve_order
    ctx.enable_progress_bars = progress_bars
