"""geotrellis_server_ray — a Ray-Data-native batch spatial engine.

A from-scratch rewrite of the query / data-processing capabilities of
geotrellis/geotrellis-server (reference at /root/reference, read-only) as
streaming ``ray.data.Dataset`` pipelines over zero-copy Arrow batches.

Layout:
  functions/  pure kernels (tile math, cell ids, geometry, map algebra, text)
  sources/    corpus synthesis + parquet readers/writers
  stages/     map_batches stage callables (stateless fns + actor-pool classes)
  pipelines/  end-to-end pipelines and the query registry
  state/      broadcast helpers, caches, checkpoint manifests

Library code never calls ``ray.init`` / ``ray.shutdown`` — sessions are
owned by bench.py, the tests, the external driver, and the one CLI entrypoint
(``__main__.py``), which guards its init and tears down only sessions it
created itself.
"""

__version__ = "0.1.0"
