"""Library scanner GUI — thin wrapper over the packaged bliss_tpu.gui.

TPU rebuild of the reference's GTK scanner (reference:
python/examples/analyze_gui.py). The implementation lives in
``bliss_tpu/gui.py`` (installed with the package; also reachable as
``bliss-tpu gui`` or ``python -m bliss_tpu.gui``); this wrapper keeps
the example discoverable next to the reference's, runnable from a
source checkout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bliss_tpu.gui import (  # noqa: F401  (re-exported for parity demos)
    CSV_DIALECT,
    ScanJob,
    build_app,
    discover_audio_files,
    main,
)

if __name__ == "__main__":
    sys.exit(main())
