"""Helper utilities with parity to ``getl/common/utils.py:25-117``.

``json_to_spark_schema`` converts Spark's portable JSON schema format
(the output of ``StructType.jsonValue()``) into a ``StructType``;
``copy_keys`` / ``copy_and_cleanup`` / ``delete_files`` are
storage-maintenance helpers, generalized from S3-only (reference
``getl/common/s3path.py``) to any local path as well, with boto3 used
only when an ``s3://`` URI is involved.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import List, Tuple

from pyspark.sql.types import StructType


def json_to_spark_schema(json_schema: dict) -> StructType:
    """Return a StructType from a Spark-JSON schema dict.

    Raises KeyError with a readable message on missing required keys
    (reference behavior, ``getl/common/utils.py:25-52``).
    """
    try:
        return StructType.fromJson(json_schema)
    except KeyError as key_error:
        raise KeyError(
            f"Missing key: {key_error}. Valid format: "
            "https://spark.apache.org/docs/latest/api/python/reference/pyspark.sql/api/"
            "pyspark.sql.types.StructType.html"
        ) from key_error
    except TypeError as type_error:
        raise TypeError(
            f"Invalid json was provided: {type_error}"
        ) from type_error


def _is_s3(path: str) -> bool:
    return path.startswith(("s3://", "s3a://"))


def _split_s3(path: str) -> Tuple[str, str]:
    no_scheme = path.split("://", 1)[1]
    bucket, _, key = no_scheme.partition("/")
    return bucket, key


def delete_files(paths: List[str]) -> None:
    """Delete every file in ``paths`` (s3:// or local)."""
    for path in paths:
        if _is_s3(path):
            import boto3  # optional dependency, only for real S3 use

            bucket, key = _split_s3(path)
            boto3.client("s3").delete_object(Bucket=bucket, Key=key)
        elif os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)


def copy_keys(transactions: List[Tuple[str, str]]) -> None:
    """Copy (source, target) path pairs; fails fast on missing source.

    Each side's scheme is branched independently, so all four
    combinations work: s3→s3 (server-side copy), s3→local (download),
    local→s3 (upload), local→local (copy2).
    """
    for source, target in transactions:
        src_s3, tgt_s3 = _is_s3(source), _is_s3(target)
        if src_s3 or tgt_s3:
            import boto3

            s3 = boto3.client("s3")
            if src_s3 and tgt_s3:
                sb, sk = _split_s3(source)
                tb, tk = _split_s3(target)
                s3.copy({"Bucket": sb, "Key": sk}, tb, tk)
            elif src_s3:
                sb, sk = _split_s3(source)
                if os.path.dirname(target):
                    os.makedirs(os.path.dirname(target), exist_ok=True)
                s3.download_file(sb, sk, target)
            else:
                tb, tk = _split_s3(target)
                s3.upload_file(source, tb, tk)
        else:
            os.makedirs(os.path.dirname(target), exist_ok=True)
            shutil.copy2(source, target)


def copy_and_cleanup(transactions: List[Tuple[str, str]]) -> None:
    """Copy then delete the sources (move semantics, reference
    ``getl/common/utils.py:96-117``)."""
    copy_keys(transactions)
    delete_files([source for source, _ in transactions])


def list_files(base_path: str, suffix: str = "") -> List[str]:
    """List files under a prefix, local or s3://, filtered by suffix.

    This is the listing layer behind the file registries (reference
    does S3-only via boto3 paginators, ``getl/common/s3path.py:80-106``).
    Driver-side metadata operation by design — at 100 TB the listing is
    bounded by file count, and the date-prefix registry narrows it
    before we ever get here.
    """
    if _is_s3(base_path):
        import boto3

        bucket, prefix = _split_s3(base_path)
        paginator = boto3.client("s3").get_paginator("list_objects_v2")
        out = []
        for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
            for obj in page.get("Contents", []):
                if obj["Key"].endswith(suffix):
                    out.append(f"s3://{bucket}/{obj['Key']}")
        return out
    pattern = os.path.join(base_path, "**")
    return sorted(
        p
        for p in glob.glob(pattern, recursive=True)
        if os.path.isfile(p) and p.endswith(suffix) and not os.path.basename(p).startswith(("_", "."))
    )
