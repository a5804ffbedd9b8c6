"""Zip packaging sink (reference: /root/reference/src/main.rs:312-325 —
Deflate level 9, the .db stored as /pricecatcher.db inside the archive)."""

from __future__ import annotations

import zipfile
from pathlib import Path


def zip_artifact(
    src: str | Path,
    zip_path: str | Path,
    arcname: str | None = None,
    level: int = 9,
) -> Path:
    src, zip_path = Path(src), Path(zip_path)
    zip_path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(
        zip_path, "w", compression=zipfile.ZIP_DEFLATED, compresslevel=level
    ) as z:
        z.write(src, arcname or src.name)
    return zip_path
