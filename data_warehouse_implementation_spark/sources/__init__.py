"""Sources and sinks (SURVEY.md §2.1).

- :mod:`.csvio` — CSV staging reads/writes (reference S1, ``python.py:13``).
- :mod:`.nested` — nested-document flattening (reference S2/S3,
  ``python.py:18-59``).
- :mod:`.catalog` — parquet-backed warehouse tables: DDL, sinks, append,
  drop, and the append-only delete guard (reference S4/S5/S8/S9 +
  M5/M7, ``python.py:217-218``, ``creating-tables.sql:196-216``).
- :mod:`.jsonio` / :mod:`.orcio` / :mod:`.xmlio` — JSONL, ORC, and XML
  staging interchange (engine extensions next to CSV).
- :mod:`.binaryio` — raw-file media ingestion (``binaryFile`` source)
  into ``MEDIA_SCHEMA``.
"""

from . import binaryio, catalog, csvio, jsonio, nested, orcio, xmlio  # noqa: F401
