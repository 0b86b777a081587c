"""Packaged data fixtures (pinned oracle CSVs, BNC corpus files,
generated feature tables) + zip-safe filesystem access.

``fixture_path`` exists because the spark-submit packaging flow ships
this package as a ``--py-files`` zip: ``__file__`` then points INSIDE
the archive, where ``open()`` and DuckDB's ``read_csv`` cannot reach.
``importlib.resources.as_file`` hands back the real path when the
package sits on disk (the common case — zero copies) and transparently
extracts to a temp file when it is zipped; the extraction lives for
the process (released at interpreter exit), which matches how the
query modules cache the resulting path in module constants.
"""

from __future__ import annotations

import atexit
from importlib import resources


def fixture_path(name: str) -> str:
    """Filesystem path of a packaged fixture file, zip-safe."""
    ref = resources.files(__name__).joinpath(name)
    cm = resources.as_file(ref)
    p = cm.__enter__()
    atexit.register(cm.__exit__, None, None, None)
    return str(p)
