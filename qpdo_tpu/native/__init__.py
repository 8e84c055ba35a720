"""Native (C++) runtime components.

``read_qps_native`` is the fast path for Maros-Mészáros-scale QPS files;
the pure-Python reader in qpdo_tpu/io/qps.py is the reference
implementation and fallback.  The shared library builds on demand with the
ambient g++ (cached next to this package).
"""

from .loader import (build_native, native_available, read_qps_native)
