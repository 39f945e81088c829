"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched Pandas UDFs.

The reference has no multimodal surface; this package adds the plumbing
a 100 TB training-data pipeline needs on top of the same engine:

- :mod:`.media` - a deterministic media table derived from
  ``documents`` (binary payload with a parseable header), a
  ``mapInPandas`` decode stage (schema, batch shape, and partitioning
  are real; the codec is a deterministic fake because image/audio libs
  are not in this container - the real decoder drops into
  :func:`.media.decode_image_real`), frame sampling, and
  metadata/embedding joins - each oracle-checked.
"""

from . import media  # noqa: F401
