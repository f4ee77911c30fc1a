package graft

import org.apache.spark.sql.functions._

import graft.graph.ConnectedComponents

/** Connected-components correctness: transitive closure, component
  * labeling by minimum member, convergence guard.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def componentsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain is transitively merged into one component") {
    // 1-2, 2-3, 3-4: (1,4) never appears as a pair but must co-cluster
    val got = componentsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate minimum labels") {
    val got = componentsOf(Seq((5L, 3L), (10L, 20L), (20L, 11L)))
    assert(got === Map(3L -> 3L, 5L -> 3L, 10L -> 10L, 20L -> 10L, 11L -> 10L))
  }

  test("random graph matches a driver-side union-find oracle") {
    val rnd = new scala.util.Random(1234)
    val edges = (1 to 60).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    // tiny driver-side union-find as the oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    // union-by-min keeps the minimum member as every root, so find(x)
    // is already the canonical (min) component label
    val want = parent.keys.map(x => x -> find(x)).toMap
    assert(componentsOf(edges) === want)
  }

  test("empty edge list yields empty labeling, no error") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))
    assert(ConnectedComponents.run(empty).count() === 0)
  }

  test("non-convergence within maxIter fails loud") {
    // a 12-node path needs ~11 min-propagation rounds; cap at 3
    val chain = (1L until 12L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      ConnectedComponents.run(chain.toDF("src", "dst"), maxIter = 3)
    }
  }
}
