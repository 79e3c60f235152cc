def test_plan_dump(spark):
    from datar_polars_spark import read_parquet
    from datar_polars_spark.scale import l2_normalize, ivfpq_train, ivfpq_encode, ivfpq_knn_join
    from datar_polars_spark.tibble import ensure_tibble
    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    n = emb.df.count()
    norm = l2_normalize(emb)
    index = ivfpq_train(norm, n_clusters=4, m=4, nbits=5, iters=3, sample_size=600, seed=3)
    coded = ivfpq_encode(norm, index)
    queries = ensure_tibble(l2_normalize(emb).df.select("vec_id", "embedding").where("vec_id < 3"))
    j = ivfpq_knn_join(queries, coded, index, k=5, nprobe=4, rerank=(n // 5) + 1)
    plan = j.df._jdf.queryExecution().executedPlan().toString()
    open("/tmp/plan_pass.txt", "w").write(plan)
    j.df.collect()
    print("COLLECT OK")
