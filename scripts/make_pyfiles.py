"""Build the ``--py-files`` artifact: sparkcrawler.zip.

The north rule ships the engine via ``spark-submit --py-files`` to a
multi-executor cluster; this packages the pure-python ``sparkcrawler``
package (no data, no tests) into a single zip that the driver AND every
executor's python workers can import from.

Usage:  python scripts/make_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "sparkcrawler")
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, repo))
    os.replace(tmp, out_path)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "sparkcrawler.zip"
    print(build(os.path.abspath(out)))
