"""Full-scan file registry (reference ``getl/fileregistry/s3_full_scan.py``).

Lists *every* file under the base path each run and anti-inserts the
unseen ones into the control table with ``date_lifted = NULL``. Works
on local paths and ``s3://`` URIs through the shared listing layer.
Scale note: listing cost is O(total files) — for date-laid-out data
prefer ``date_prefix_scan`` which only lists the open date window.
"""

from __future__ import annotations

from typing import List

from getl_spark.common.utils import list_files
from getl_spark.registry.base import ControlTableRegistry


class FullScan(ControlTableRegistry):
    def load(self, path: str, suffix: str = "") -> List[str]:
        discovered = list_files(path, suffix)
        rows = [(file_path, None) for file_path in discovered]
        self._register_new_files(rows)
        return self._unlifted_paths()
