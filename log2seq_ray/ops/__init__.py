"""Large-scale training-data operators over Ray Datasets.

* ``dedup``      — exact / MinHash+LSH (co-partitioned verify) / SimHash /
                   embedding-cosine near-dup; union-find and distributed
                   label-propagation clustering
* ``similarity`` — brute-force and IVF cosine top-k
* ``text``       — token stats, quality + Gopher filter, lang-ID,
                   fingerprints, repetition, splits, stratified sampling
* ``normalize``  — HTML strip, unicode/whitespace normalize, PII masking,
                   cross-document boilerplate removal
* ``join``       — broadcast join, partitioned hash join
* ``asof``       — as-of join, per-group top-k
* ``windows``    — sessionization, exact count-distinct
* ``stats``      — group quantiles, hopping windows
* ``sketch``     — HyperLogLog approximate distinct
* ``exchange``   — the shared raw-task hash exchange all of the above use
* ``multimodal`` — image/audio/video stages (stub backends, real plumbing)
"""
