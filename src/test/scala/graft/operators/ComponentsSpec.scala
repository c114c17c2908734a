package graft.operators

import graft.SparkTestBase

class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], vertices: Seq[Long]): Map[Long, Long] =
    Components.connectedComponents(
      edges.toDF("a", "b"), "a", "b",
      vertices.toDF("id"), "id")
      .as[(Long, Long)].collect().toMap

  test("singletons label themselves; no edges") {
    assert(cc(Nil, Seq(1L, 2L, 3L)) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("chain collapses to min id regardless of edge orientation") {
    // path 5-4-3-2-1 given in mixed orientations: min-label must travel
    // the full diameter (exercises the propagate/compress alternation)
    val edges = Seq((5L, 4L), (3L, 4L), (3L, 2L), (1L, 2L))
    assert(cc(edges, 1L to 5L) == (1L to 5L).map(_ -> 1L).toMap)
  }

  test("two components plus an isolated vertex") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L))
    val got = cc(edges, Seq(10L, 11L, 12L, 20L, 21L, 30L))
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("long path converges within the iteration budget (pointer jumping)") {
    // a 64-vertex path would need 63 rounds of pure propagation; the
    // compression step must bring it under the default 20-round budget
    val n = 64L
    val edges = (1L until n).map(i => (i, i + 1))
    val got = cc(edges, 1L to n)
    assert(got == (1L to n).map(_ -> 1L).toMap)
  }

  test("random graph matches a local union-find") {
    val rnd = new scala.util.Random(3)
    val vertices = (1L to 60L).toSeq
    val edges = Seq.fill(40)((rnd.nextInt(60) + 1L, rnd.nextInt(60) + 1L))
    // local union-find oracle
    val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find(v: Long): Long = if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val expected = vertices.map { v =>
      // canonical label = min id in component
      val root = find(v)
      v -> vertices.filter(u => find(u) == root).min
    }.toMap
    assert(cc(edges, vertices) == expected)
  }

  test("clusterSummary sizes sum to vertex count") {
    val edges = Seq((1L, 2L), (2L, 3L))
    val labels = Components.connectedComponents(
      edges.toDF("a", "b"), "a", "b", (1L to 5L).toDF("id"), "id")
    val sizes = Components.clusterSummary(labels)
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(1L -> 3L, 4L -> 1L, 5L -> 1L))
  }
}
