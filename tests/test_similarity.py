

def test_power_iteration_matches_numpy_and_converges(spark):
    """Two checks with numpy as referee: (1) the engine's 5-round
    quantized iterate is BIT-IDENTICAL to the same recurrence run in
    numpy (the engine does exactly the algorithm it claims); (2) the
    recurrence itself converges toward the dominant eigenvector as
    rounds grow — the synthetic embeddings are near-isotropic
    (lambda2/lambda1 ~ 0.93), so alignment needs tens of rounds, which
    is why the contract query pins round-5 EXACTNESS and this test pins
    the asymptotics."""
    import numpy as np

    from omldm_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["embedding_power_iteration"](spark, sf).collect()
    got = np.zeros(64)
    for r in out:
        got[r["i"]] = r["v_q"]

    emb = np.array([
        row["embedding"]
        for row in spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("embedding").collect()
    ], dtype=float)
    q = np.round(emb * 1000.0)             # the query's quantization
    G = q.T @ q
    Q = 1_000_000

    def iterate(R):
        v = np.full(64, Q, dtype=float)
        for _ in range(R):
            u = G @ v
            arg = int(np.argmax(np.abs(u)))   # ties: argmax = min index
            v = np.floor(Q * u / u[arg] + 0.5)
        return v

    assert np.array_equal(got, iterate(5))   # engine == recurrence

    top = np.linalg.eigh(G)[1][:, -1]

    def cos(R):
        v = iterate(R)
        return abs(float((v / np.linalg.norm(v)) @ top))

    c5, c30, c60 = cos(5), cos(30), cos(60)
    assert c5 < c30 < c60                    # monotone alignment
    assert c60 > 0.99                        # converged
