"""S3 accessor — porcupine-s3 re-expressed for Spark's execution model.

Reference behavior mirrored (porcupine-s3/src/Network/AWS/S3/
TaskPipelineUtils.hs):

- retry with exponential backoff around object streaming (:158-177,
  which hand-rolls amazonka's policy because streamed gets bypass it);
- credential discovery with a warned dummy-credentials fallback so
  pipelines that never touch S3 still run (:60-75);
- whole-folder upload/download/list and object copy (:87-133).

Spark-first design: the DATA PLANE needs no code at all — binding a
dataset to ``s3a://bucket/key.parquet`` makes ``spark.read``/``write``
stream it through the hadoop-aws connector, distributed, with the
connector's own multipart upload and retry machinery (the reference's
``uploadObj`` TODO about multipart is solved by the platform). What
porcupine-s3 implements imperatively, this module exposes as:

- :func:`configure_s3a` — one idempotent call setting the retry/
  credential/endpoint posture on the Hadoop conf (runtime-settable;
  honored by every subsequent s3a scan in the session);
- control-plane folder ops (:func:`stream_folder_uri`,
  :func:`upload_folder`, :func:`download_folder`, :func:`copy_obj`)
  via the Hadoop FileSystem API, which resolves ANY scheme — the same
  code path serves s3a://, file://, hdfs:// — so the ops are unit-
  testable against file:// with no live bucket.

These folder ops move driver-side metadata and small control files
(the reference's use case: configs, folder mirroring). Bulk data moves
through spark.read/write — never through the driver.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession

log = logging.getLogger("porcupine_spark.s3")

# Exponential-backoff posture mirroring the reference's retry policy
# (TaskPipelineUtils.hs:158-177: limitRetries + base*growth^n delay).
DEFAULT_RETRY_LIMIT = 7
DEFAULT_RETRY_INTERVAL_MS = 500


def configure_s3a(
    spark: SparkSession,
    retry_limit: int = DEFAULT_RETRY_LIMIT,
    retry_interval_ms: int = DEFAULT_RETRY_INTERVAL_MS,
    endpoint: str | None = None,
    path_style_access: bool | None = None,
    anonymous_fallback: bool = True,
) -> dict[str, str]:
    """Set the session's s3a posture; returns the conf dict applied.

    - retries: s3a's built-in exponential retry (``fs.s3a.retry.*``)
      gets the reference's limit/base-interval; throttling retries are
      left at the connector default (it already backs off harder);
    - credentials: the default provider chain (env -> sysprops ->
      instance profile) is kept; when nothing is configured and
      ``anonymous_fallback`` is set, anonymous access is APPENDED to
      the chain with a warning — the reference's "dummy credentials"
      posture (TaskPipelineUtils.hs:66-75): public buckets still read,
      private ones fail at access time, and nothing else in the
      pipeline is blocked;
    - ``endpoint``/``path_style_access``: MinIO/localstack-style
      deployments.
    """
    conf: dict[str, str] = {
        "fs.s3a.retry.limit": str(retry_limit),
        "fs.s3a.retry.interval": f"{retry_interval_ms}ms",
        "fs.s3a.attempts.maximum": str(retry_limit),
        "fs.s3a.connection.maximum": "96",
    }
    if endpoint:
        conf["fs.s3a.endpoint"] = endpoint
    if path_style_access is not None:
        conf["fs.s3a.path.style.access"] = str(path_style_access).lower()

    has_creds = bool(
        os.environ.get("AWS_ACCESS_KEY_ID")
        or os.environ.get("AWS_PROFILE")
        or os.environ.get("AWS_ROLE_ARN")
    )
    if not has_creds and anonymous_fallback:
        log.warning(
            "no AWS credentials found in the environment; appending "
            "anonymous S3 access to the provider chain — private "
            "buckets will fail at access time (reference behavior: "
            "porcupine-s3 TaskPipelineUtils.hs:66-75)"
        )
        conf["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider,"
            "com.amazonaws.auth.EnvironmentVariableCredentialsProvider,"
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
    return conf


def _fs_for(spark: SparkSession, uri: str):
    """(FileSystem, Path) for a URI via Hadoop's scheme resolution."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    return path.getFileSystem(hconf), path


def stream_folder_uri(spark: SparkSession, uri: str) -> list[str]:
    """Relative paths of every file under ``uri``, recursively —
    streamS3Folder (TaskPipelineUtils.hs:113-124) generalized to any
    scheme. Driver-side listing (it feeds control flow, like the
    reference's Stream); bulk reads of the listed files should go
    through spark.read on the folder itself."""
    fs, root = _fs_for(spark, uri)
    base = root.toUri().getPath().rstrip("/") + "/"
    out: list[str] = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        p = it.next().getPath().toUri().getPath()
        out.append(p[len(base):] if p.startswith(base) else p)
    return sorted(out)


def upload_folder(spark: SparkSession, local_dir: str, dest_uri: str) -> list[str]:
    """Mirror a local folder to a remote URI, preserving relative paths
    (uploadFolder, TaskPipelineUtils.hs:96-111). Returns uploaded
    relative paths; logs per-object like the reference."""
    jvm = spark.sparkContext._jvm
    fs, _ = _fs_for(spark, dest_uri)
    uploaded = []
    for dirpath, _dirs, files in os.walk(local_dir):
        for f in files:
            src = os.path.join(dirpath, f)
            rel = os.path.relpath(src, local_dir)
            dst = jvm.org.apache.hadoop.fs.Path(dest_uri.rstrip("/") + "/" + rel)
            fs.copyFromLocalFile(False, True, jvm.org.apache.hadoop.fs.Path(src), dst)
            log.info("%s uploaded.", rel)
            uploaded.append(rel)
    return sorted(uploaded)


def download_folder(spark: SparkSession, src_uri: str, local_dir: str) -> list[str]:
    """Inverse of :func:`upload_folder` (downloadFolder,
    TaskPipelineUtils.hs:125-133): fetch every file under ``src_uri``
    into ``local_dir``, creating subdirectories as needed."""
    jvm = spark.sparkContext._jvm
    fs, _ = _fs_for(spark, src_uri)
    rels = stream_folder_uri(spark, src_uri)
    for rel in rels:
        dst = os.path.join(local_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        fs.copyToLocalFile(
            False,
            jvm.org.apache.hadoop.fs.Path(src_uri.rstrip("/") + "/" + rel),
            jvm.org.apache.hadoop.fs.Path(dst),
        )
    return rels


def uri_exists(spark: SparkSession, uri: str) -> bool:
    """Existence probe through the same any-scheme FileSystem path the
    folder ops use (s3a://, file://, hdfs://)."""
    fs, path = _fs_for(spark, uri)
    return fs.exists(path)


def copy_obj(spark: SparkSession, src_uri: str, dest_uri: str) -> None:
    """Server-side object copy within/between stores (copyObj,
    TaskPipelineUtils.hs:87-93) via Hadoop FileUtil."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    sfs, sp = _fs_for(spark, src_uri)
    dfs, dp = _fs_for(spark, dest_uri)
    ok = jvm.org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp, False, True, hconf)
    if not ok:
        raise IOError(f"copy {src_uri} -> {dest_uri} failed")
