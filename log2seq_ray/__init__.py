"""log2seq_ray: a Ray-Data-native log/telemetry parse → enrich → route →
aggregate engine with the query/data-processing capabilities of the
reference log parser (amulog/log2seq), built from scratch for streaming
execution over Arrow batches at 10^12-row scale.

Layers:

* ``rules``    — declarative, picklable rule specs (items, actions, presets)
* ``kernel``   — compiled batch kernels (header cascade, statement chain,
                 vectorized converters, timestamp assembly)
* ``stages``   — Ray Data stages (actor-pool parse, enrich, route, aggregate)
* ``sources``  — input readers + the synthetic web-page corpus generator
* ``pipelines``— end-to-end pipelines (flagship parse→enrich→route→aggregate)
* ``state``    — per-partition lineage manifests / resume
* ``ops``      — large-scale training-data operators (dedup, similarity,
                 text analysis, multimodal stubs)

IMPORTANT: nothing in this package calls ``ray.init``/``ray.shutdown`` —
sessions are owned by the driver, ``bench.py``, CLI entry points and the
test fixture only.
"""

__version__ = "0.1.0"

from .rules import actions, items  # noqa: F401
from .rules.header import HeaderRule  # noqa: F401
from .kernel.parse import CompiledLogParser  # noqa: F401
