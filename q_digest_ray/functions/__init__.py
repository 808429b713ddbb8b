from q_digest_ray.functions.hashing import hash64, hash_columns, splitmix64

__all__ = ["hash64", "hash_columns", "splitmix64"]
