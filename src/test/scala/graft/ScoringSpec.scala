package graft

import graft.analytics.Scoring
import org.apache.spark.sql.functions._

/** Hand-computed values for the reference's score + classifier expressions
  * (stats_dashboard.py:119-143).
  */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("suspiciousScore: weighted sum, root indicator, clip at 100") {
    val df = Seq(
      (10, 3, 40, 1, 4),   // 2·10+3·3+0.5·40+15·1+4 = 68
      (100, 50, 500, 5, 10) // clips at 100
    ).toDF("failed", "ports", "total", "root", "div")
    val out = df.select(Scoring.suspiciousScore(
      $"failed", $"ports", $"total", $"root", $"div")).collect().map(_.getDouble(0))
    assert(out(0) == 68.0)
    assert(out(1) == 100.0)
  }

  test("classifyProfile: percentages sum to ~100 and match hand math") {
    val df = Seq((68.0, 10, 3, 1, 4)).toDF("score", "failed", "ports", "root", "div")
    val (a, b, l) = Scoring.classifyProfile($"score", $"failed", $"ports", $"root", $"div")
    val r = df.select(a.as("a"), b.as("b"), l.as("l")).head()
    // attacker = min(100, 0.6·68 + 5·1 + 2·10) = 65.8; bot = min(100, 1.5·4 + 2·3) = 12
    // legit = max(0, 100-65.8-12) = 22.2; total = 100
    assert(r.getDouble(0) == 65.8)
    assert(r.getDouble(1) == 12.0)
    assert(r.getDouble(2) == 22.2)
  }

  test("classifyProfile normalizes when attacker+bot exceed 100") {
    val df = Seq((100.0, 50, 40, 10, 8)).toDF("score", "failed", "ports", "root", "div")
    val (a, b, l) = Scoring.classifyProfile($"score", $"failed", $"ports", $"root", $"div")
    val r = df.select(a.as("a"), b.as("b"), l.as("l")).head()
    // attacker = min(100, 60+50+100)=100; bot = min(100, 12+80)=92; legit=0
    // total=192 → attacker% = floor(100·100/192·10+0.5)/10 = 52.1 ; bot% = 47.9
    assert(r.getDouble(0) == 52.1)
    assert(r.getDouble(1) == 47.9)
    assert(r.getDouble(2) == 0.0)
  }
}
