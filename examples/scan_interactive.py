"""Interactive library scan: live progress + cancellation.

The terminal analog of the reference's GTK scanner
(reference: python/examples/analyze_gui.py — a worker thread with a
progress bar and a cancel button backed by a threading.Event): analysis
streams in the background while the foreground waits for a single 'q'
keypress (or Ctrl-C) to cancel. Cancellation drains the in-flight device
batches, flushes the feature store, and the next run resumes from it.

Usage: python examples/scan_interactive.py <music-dir> [store-dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import threading

from bliss_tpu.cli import _collect_audio_files
from bliss_tpu.pipeline import analyze_library
from bliss_tpu.store import FeatureStore


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    files = _collect_audio_files(sys.argv[1:2])
    store = FeatureStore(sys.argv[2] if len(sys.argv) > 2 else ".bliss-store")
    cancel = threading.Event()

    def keywatcher():
        # one-char reads; 'q' cancels (the GUI's cancel button)
        try:
            import termios
            import tty

            fd = sys.stdin.fileno()
            old = termios.tcgetattr(fd)
            try:
                tty.setcbreak(fd)
                while not cancel.is_set():
                    if sys.stdin.read(1).lower() == "q":
                        cancel.set()
                        return
            finally:
                termios.tcsetattr(fd, termios.TCSADRAIN, old)
        except Exception:  # non-tty stdin: rely on Ctrl-C
            pass

    watcher = threading.Thread(target=keywatcher, daemon=True)
    watcher.start()

    def progress(done, total, msg):
        pct = 100.0 * done / max(total, 1)
        bar = "#" * int(pct / 2.5)
        print(f"\r[{bar:40s}] {pct:5.1f}%  {msg[:50]:50s} (q to cancel)",
              end="", file=sys.stderr)

    result = analyze_library(
        files, store=store, batch_size=16, progress=progress, cancel=cancel
    )
    print("", file=sys.stderr)
    n_ok = int(result.ok.sum())
    if result.stats.get("cancelled"):
        print(f"cancelled: {n_ok}/{len(files)} analyzed and stored — rerun "
              "to resume")
        return 130
    print(f"done: {n_ok}/{len(files)} songs analyzed "
          f"({len(result.errors)} failed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
