package graft.operators

import graft.SparkSpec

/** Serving-walk gate on the fixture. */
class GraphServeSpec extends SparkSpec {

  test("beam search over the converged graph reaches exact top-1 recall floor") {
    val (nq, hits, recall, converged) =
      GraphServe.serveStats(spark, "/root/testdata/sf0.001")
    info(s"queries=$nq hits=$hits recall=${recall} permille")
    assert(nq == GraphServe.QueryCount)
    assert(converged, "build must converge before serving")
    assert(recall >= GraphServe.ServeRecallFloorPermille)
  }
}
