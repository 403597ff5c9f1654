"""Runtime utilities (timers, environment setup)."""

import warnings
from pathlib import Path

_MAP_COUNT_MIN = 262144


def ensure_map_count(minimum: int = _MAP_COUNT_MIN) -> None:
    """Best-effort raise of vm.max_map_count.

    XLA:CPU's LLVM JIT mmaps one code section per fused kernel; an
    MP-heavy solver program produces tens of thousands of kernels and
    the Linux default of 65530 mappings makes LLVM fail with a
    misleading 'Cannot allocate memory'.  No-op without privileges or
    on non-Linux.  (TPU execution is unaffected; this is for the CPU
    testing/emulation path.)
    """
    path = Path("/proc/sys/vm/max_map_count")
    try:
        current = int(path.read_text())
        if current < minimum:
            path.write_text(str(minimum))
    except (OSError, ValueError):
        warnings.warn(
            "could not raise vm.max_map_count; very large CPU solves may "
            "fail LLVM compilation with 'Cannot allocate memory'")
