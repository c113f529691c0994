"""Storage backends beyond Hadoop-FS schemes.

Local files and ``s3a://`` URIs go straight through ``spark.read`` /
``df.write`` (the Hadoop connectors already provide streaming, retry
with backoff, and folder ops — reference parity for porcupine-s3 is
configuration, not code). HTTP, which Spark has no source for, is a
driver-coordinated parallel fetch (sources.http).
"""
