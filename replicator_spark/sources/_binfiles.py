"""Shared binaryFile loader for the wire-format decoders — batch or
Structured Streaming.  A recorded-segment directory is a valid
streaming source (new segments = new files), which is exactly how a
live tail accumulates: the same decode mapInPandas runs unchanged on
the streaming frame, and the checkpoint's file-source log provides the
resume contract the reference keeps in per-source positions."""

from __future__ import annotations

# readStream.format("binaryFile") requires an explicit schema; this is
# the source's fixed four-column shape
BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def load_binary_files(
    spark, directory: str, *, streaming: bool = False, recursive: bool = False
):
    reader = spark.readStream if streaming else spark.read
    r = reader.format("binaryFile")
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    if streaming:
        r = r.schema(BINARYFILE_SCHEMA)
    return r.load(directory)
