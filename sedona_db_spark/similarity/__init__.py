from sedona_db_spark.similarity.ann import (  # noqa: F401
    cosine_topk_bruteforce, lsh_ann_topk, embedding_neardup_pairs,
    ivf_ann_topk,
)
