from q_digest_ray.sketches.base import Sketch, sketch_from_bytes
from q_digest_ray.sketches.qdigest import QDigest
from q_digest_ray.sketches.hll import HyperLogLog
from q_digest_ray.sketches.cms import CountMinSketch
from q_digest_ray.sketches.bloom import BloomFilter
from q_digest_ray.sketches.tdigest import TDigest
from q_digest_ray.sketches.kll import KLL
from q_digest_ray.sketches.kmv import KMV
from q_digest_ray.sketches.misra_gries import MisraGries
from q_digest_ray.sketches.sample import SampleSketch

__all__ = [
    "Sketch",
    "sketch_from_bytes",
    "QDigest",
    "HyperLogLog",
    "CountMinSketch",
    "BloomFilter",
    "TDigest",
    "KLL",
    "KMV",
    "MisraGries",
    "SampleSketch",
]
