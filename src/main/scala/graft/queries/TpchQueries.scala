package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Additional TPC-H-shaped relational queries (SURVEY A11/O2 depth) over
  * the fixture star schema — chosen to exercise the Catalyst paths the
  * round-1 core missed: EXISTS decorrelation into semi-joins, scalar
  * correlated subqueries, HAVING over grouped aggregates, OR-of-ANDs
  * predicate pushdown, conditional aggregation, and anti-join NOT
  * EXISTS. (The fixture schema has no partsupp, so Q2/Q11/Q20 shapes are
  * out of reach; these are the feasible set.)
  *
  * Scale notes: every EXISTS/IN becomes a left-semi hash join (no row
  * multiplication); scalar subqueries decorrelate into one aggregate +
  * join, not a per-row probe; HAVING filters post-aggregate (tiny); the
  * Q19 OR-of-ANDs stays a single scan with the whole disjunction pushed
  * to parquet row groups.
  */
object TpchQueries {

  /** Exact revenue term in 1e-4-dollar integer units.
    * `l_extendedprice`/`l_discount` land as parquet doubles with exact
    * 2-decimal granularity, and `round(sum(double), 2)` is
    * engine-dependent at half-cent ties (round 4 hit one: 307843.595).
    * Lifting both factors to integers (cents × discount basis points)
    * makes every sum exact in ANY fold order — and integer aggregation
    * is also ~40% faster than the DECIMAL(12,2) alternative. Headroom:
    * ≤ 1.05e9 per row, so a 64-bit sum holds ~8.8e9 rows per group
    * before overflow (decimal or a two-level split takes over beyond). */
  private def revenueE4 =
    round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))

  private val revenueE4Sql =
    "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"

  /** Half-up rounding of an e4 sum to whole cents, then dollars — pure
    * integer ops + one exact division, bit-identical across engines. */
  private def e4ToDollars(sumCol: String): Column =
    (expr(s"($sumCol + 50) div 100").cast("double") / lit(100.0))

  private def e4ToDollarsSql(sumExpr: String): String =
    s"CAST((CAST($sumExpr AS BIGINT) + 50) // 100 AS DOUBLE) / CAST(100.0 AS DOUBLE)"

  /** Deterministic synthesized partsupp: the fixture star schema ships
    * no partsupp table, so the Q2/Q11/Q20 shapes derive one — 4 supplier
    * slots per part, keyed/priced by pure integer functions of the keys
    * (reproduced verbatim in the oracle CTE). Costs are integer CENTS so
    * every aggregate over them is exact regardless of fold order; the
    * /100.0 display conversion happens after aggregation on both sides. */
  private def partsupp(t: graft.Tables): org.apache.spark.sql.DataFrame =
    t.part.select(col("p_partkey"))
      .crossJoin(broadcast(t.supplier.agg(count(lit(1)).as("n_supp"))))
      .select(col("p_partkey"), explode(expr("sequence(0, 3)")).as("i"), col("n_supp"))
      .select(
        col("p_partkey").as("ps_partkey"),
        pmod(col("p_partkey") * 31 + col("i") * 17, col("n_supp")).as("ps_suppkey"),
        (pmod(col("p_partkey") * 37 + col("i") * 19, lit(9999)) + 1).cast("int").as("ps_availqty"),
        (pmod(col("p_partkey") * 13 + col("i") * 7, lit(100000)) + 100).as("ps_cost_cents"))

  private val partsuppSql =
    """ns AS (SELECT count(*) AS n_supp FROM supplier),
       ps AS (SELECT p_partkey AS ps_partkey,
                (p_partkey*31 + i*17) % n_supp AS ps_suppkey,
                CAST((p_partkey*37 + i*19) % 9999 + 1 AS INT) AS ps_availqty,
                (p_partkey*13 + i*7) % 100000 + 100 AS ps_cost_cents
              FROM part, ns, generate_series(0, 3) AS g(i))"""

  /** Q2 shape — min-cost supplier per part within a region. The per-part
    * argmin is ONE aggregate over a struct (cost, suppkey) with a
    * deterministic tie-break on the key, then a broadcast join back for
    * the supplier name. At scale: one partial+final aggregate around a
    * single exchange (min-of-struct plans as SortAggregate — sorted on
    * the GROUP keys only, with map-side partials; unlike the window
    * formulation there's no rank state and the shuffle carries one row
    * per (partition × part), not every candidate). */
  val q2 = Q(
    "q2_min_cost_supplier",
    "Correlated-min shape via struct-argmin aggregate: cheapest in-region supplier per small part, deterministic tie-break.",
    (s, dir) => {
      val t = Tables(s, dir)
      val supRegion = t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"))
      t.part.filter(col("p_size") < 15).select(col("p_partkey"), col("p_name"))
        .join(partsupp(t), col("p_partkey") === col("ps_partkey"))
        .join(supRegion, col("ps_suppkey") === col("s_suppkey"))
        .groupBy(col("p_partkey"), col("p_name"))
        .agg(min(struct(col("ps_cost_cents"), col("ps_suppkey"))).as("m"))
        .select(col("p_partkey"), col("p_name"),
          col("m.ps_suppkey").as("supp_key"),
          (col("m.ps_cost_cents") / lit(100.0)).as("supply_cost"))
    },
    Some(s"""WITH $partsuppSql,
            sup AS (SELECT s_suppkey FROM supplier
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey AND r_name = 'AMERICA'),
            cand AS (SELECT p_partkey, p_name, ps_suppkey, ps_cost_cents
                     FROM part JOIN ps ON p_partkey = ps_partkey
                     JOIN sup ON ps_suppkey = s_suppkey
                     WHERE p_size < 15),
            ranked AS (SELECT *, row_number() OVER (PARTITION BY p_partkey ORDER BY ps_cost_cents, ps_suppkey) AS rn
                       FROM cand)
            SELECT p_partkey, p_name, CAST(ps_suppkey AS BIGINT) AS supp_key,
                   CAST(ps_cost_cents AS DOUBLE) / 100.0 AS supply_cost
            FROM ranked WHERE rn = 1""")
  )

  /** Q11 shape — inventory value share: grouped value vs a scalar
    * aggregate over the SAME derived table, compared multiplicatively in
    * exact integer cents. The threshold is mean-relative (value·n > 2·total,
    * i.e. value > 2× the average part's stock value) so selectivity is
    * scale-INVARIANT: a fixed fraction-of-total cutoff (TPC-H's 1/250)
    * selects zero rows once the part count passes 250, which made the row
    * vacuous at sf ≥ 0.01. Both sides stay BIGINT (max ≈ 4e9 cents × n
    * parts — overflow-safe past n = 1e9). */
  val q11 = Q(
    "q11_value_share",
    "Scalar-subquery threshold over grouped inventory value (exact integer-cents compare): parts worth > 2x the mean stock value.",
    (s, dir) => {
      val t = Tables(s, dir)
      val value = partsupp(t)
        .groupBy(col("ps_partkey"))
        .agg(sum(col("ps_cost_cents") * col("ps_availqty")).as("value_cents"))
      value
        .crossJoin(broadcast(value.agg(
          sum(col("value_cents")).as("total_cents"),
          count(lit(1)).as("n_parts"))))
        .filter(col("value_cents") * col("n_parts") > col("total_cents") * 2)
        .select(col("ps_partkey"), (col("value_cents") / lit(100.0)).as("stock_value"))
    },
    Some(s"""WITH $partsuppSql,
            v AS (SELECT ps_partkey, CAST(sum(ps_cost_cents * ps_availqty) AS BIGINT) AS value_cents
                  FROM ps GROUP BY ps_partkey),
            tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents,
                           CAST(count(*) AS BIGINT) AS n_parts FROM v)
            SELECT ps_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS stock_value
            FROM v, tot WHERE value_cents * n_parts > total_cents * 2""")
  )

  /** Q20 shape — suppliers with surplus stock: partsupp availability
    * above half the shipped quantity of that (part, supplier) in a date
    * window, then a left-semi join to supplier detail. Quantities are
    * integral doubles, so the 0.5× compare is exact in both engines. */
  val q20 = Q(
    "q20_avail_semi",
    "Correlated-aggregate semi-join: suppliers whose availability exceeds half the year's shipped quantity for that part.",
    (s, dir) => {
      val t = Tables(s, dir)
      val shipped = t.lineitem
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-01-01")))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val surplus = partsupp(t)
        .join(shipped,
          col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") > col("qty") * 0.5)
        .select(col("ps_suppkey")).distinct()
      t.supplier
        .join(surplus, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    },
    Some(s"""WITH $partsuppSql,
            shipped AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
                        FROM lineitem
                        WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
                        GROUP BY l_partkey, l_suppkey),
            surplus AS (SELECT DISTINCT ps_suppkey
                        FROM ps JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
                        WHERE ps_availqty > qty * 0.5)
            SELECT s_suppkey, s_name FROM supplier
            WHERE EXISTS (SELECT 1 FROM surplus WHERE ps_suppkey = s_suppkey)""")
  )

  /** Q4 shape — order-priority count where an EXISTS lineitem condition
    * holds: decorrelated left-semi join. */
  val q4 = Q(
    "q4_exists_semi",
    "EXISTS subquery -> left-semi join; priority counts over a date window.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .filter(col("o_orderdate") >= to_timestamp(lit("1994-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .join(t.lineitem.filter(col("l_shipdate") > to_timestamp(lit("1995-06-01")))
          .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1994-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1995-06-01')
            GROUP BY o_orderpriority""")
  )

  /** Q7 shape — volume between two nations, customer nation x supplier
    * nation, grouped by year. */
  val q7 = Q(
    "q7_nation_volume",
    "Two-nation shipping volume: 5-way join, cross-pair predicate, per-year revenue.",
    (s, dir) => {
      val t = Tables(s, dir)
      val n1 = t.nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val n2 = t.nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .filter((col("cust_nation") === "NATION_1" && col("supp_nation") === "NATION_2") ||
          (col("cust_nation") === "NATION_2" && col("supp_nation") === "NATION_1"))
        .groupBy(col("cust_nation"), col("supp_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(sum(revenueE4).as("rev_e4"))
        .withColumn("revenue", e4ToDollars("rev_e4")).drop("rev_e4")
    },
    Some(s"""SELECT c.cust_nation, s.supp_nation, year(l_shipdate) AS l_year,
            ${e4ToDollarsSql(s"sum($revenueE4Sql)")} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN (SELECT n_nationkey, n_name AS cust_nation FROM nation) c ON c_nationkey = c.n_nationkey
            JOIN (SELECT n_nationkey, n_name AS supp_nation FROM nation) s ON s_nationkey = s.n_nationkey
            WHERE (cust_nation = 'NATION_1' AND supp_nation = 'NATION_2')
               OR (cust_nation = 'NATION_2' AND supp_nation = 'NATION_1')
            GROUP BY c.cust_nation, s.supp_nation, year(l_shipdate)""")
  )

  /** Q12 shape — shipmode-ish split with conditional aggregation over
    * priority classes. */
  val q12 = Q(
    "q12_conditional_agg",
    "CASE-inside-sum conditional aggregation: high/low-priority line counts per return flag.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("low_line_count"))
    },
    Some("""SELECT l_returnflag,
            CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
            CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            GROUP BY l_returnflag""")
  )

  /** Q14 shape — promo revenue share: conditional numerator over a full
    * aggregate denominator in one pass. */
  val q14 = Q(
    "q14_promo_share",
    "Ratio of conditional to total aggregate in a single pass (no self-join): promo-brand revenue share per month.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(round(
          sum(when(col("p_brand") === "Brand#1", revenueE4).otherwise(lit(0L)))
            .cast("double") * 100.0 /
            sum(revenueE4).cast("double"), 4).as("promo_pct"))
    },
    Some(s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
            round(CAST(sum(CASE WHEN p_brand = 'Brand#1' THEN $revenueE4Sql ELSE 0 END) AS DOUBLE)
                  * 100.0 / CAST(sum($revenueE4Sql) AS DOUBLE), 4) AS promo_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY strftime(l_shipdate, '%Y-%m')""")
  )

  /** Q18 shape — large orders via HAVING on a grouped sum, then joined
    * back for customer detail. */
  val q18 = Q(
    "q18_having",
    "HAVING over grouped sum -> join back to detail: customers with bulk orders.",
    (s, dir) => {
      val t = Tables(s, dir)
      val big = t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("total_qty") > 150)
      big.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_totalprice"), col("total_qty"))
    },
    Some("""SELECT c_name, o_orderkey, o_totalprice, total_qty
            FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
                  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150) big
            JOIN orders ON big.l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey""")
  )

  /** Q19 shape — OR-of-ANDs pushdown: the whole disjunction reaches the
    * scan as one pushed filter tree. */
  val q19 = Q(
    "q19_or_of_ands",
    "Disjunctive predicate bundle (brand x size x quantity windows) pushed into one scan; revenue sum.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 21)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 30) && col("l_quantity").between(10, 40)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 50) && col("l_quantity").between(20, 50)))
        .agg(sum(revenueE4).as("rev_e4"), count(lit(1)).as("n_lines"))
        .withColumn("revenue", e4ToDollars("rev_e4")).drop("rev_e4")
    },
    Some(s"""SELECT ${e4ToDollarsSql(s"sum($revenueE4Sql)")} AS revenue, count(*) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 40)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 50)""")
  )

  /** Q22 shape — customers above the average balance with no RECENT
    * orders (every fixture customer has some order, so plain NOT EXISTS
    * would be vacuously empty): scalar subquery + NOT EXISTS anti-join
    * over the date-filtered fact. */
  val q22 = Q(
    "q22_scalar_antijoin",
    "Scalar aggregate subquery (avg balance) + NOT EXISTS anti-join on recent orders: dormant rich customers per nation.",
    (s, dir) => {
      val t = Tables(s, dir)
      val avgBal = t.customer.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("ab"))
      val recent = t.orders
        .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
        .select(col("o_custkey"))
      t.customer
        .join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
    },
    Some("""SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
            FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY c_nationkey""")
  )

  /** Q10 shape — returned-item revenue: 4-way join with a date-window
    * fact filter, broadcast nation dim, top-20 via TakeOrderedAndProject
    * (tie-broken on the key for determinism). */
  val q10 = Q(
    "q10_returned_top",
    "Returned-item revenue: date-windowed orders x R-flag lineitem x customer x broadcast nation, grouped revenue, deterministic top-20.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(
          col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1996-04-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(t.lineitem.filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(revenueE4).as("rev_e4"))
        .withColumn("revenue", e4ToDollars("rev_e4")).drop("rev_e4")
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
            ${e4ToDollarsSql(s"sum($revenueE4Sql)")} AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20""")
  )

  /** Q6 shape — the classic forecasting-revenue-change scan: no join at
    * all, every predicate pushed to the parquet scan, one global sum.
    * The discount band compares integer basis points (round(d*100)), not
    * raw doubles, so the band edges cannot flip between engines. */
  val q6 = Q(
    "q6_forecast_revenue",
    "Pure pushdown scan + global agg: one-year window, discount band in integer basis points, quantity cap; revenue = sum(price x discount).",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          round(col("l_discount") * 100).cast("long").between(3, 7) &&
          col("l_quantity") < 24)
        .agg(
          sum(round(col("l_extendedprice") * 100).cast("long") *
            round(col("l_discount") * 100).cast("long")).as("rev_e4"),
          count(lit(1)).as("n_lines"))
        .withColumn("revenue", e4ToDollars("rev_e4")).drop("rev_e4")
    },
    Some(s"""SELECT count(*) AS n_lines,
            ${e4ToDollarsSql(
              "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT))")} AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 3 AND 7
              AND l_quantity < 24""")
  )

  /** Q15 shape — top supplier by windowed revenue: a derived "view"
    * aggregated once, its scalar max broadcast back, equality selecting
    * the winner(s). Revenue stays in exact integer e4 units through the
    * max-compare, so ties are engine-stable; conversion to dollars
    * happens after selection. */
  val q15 = Q(
    "q15_top_supplier",
    "View + scalar-max selection: per-supplier revenue over a quarter, keep the supplier(s) achieving the maximum (exact integer compare).",
    (s, dir) => {
      val t = Tables(s, dir)
      val rev = t.lineitem
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenueE4).as("rev_e4"))
      rev.crossJoin(broadcast(rev.agg(max(col("rev_e4")).as("max_e4"))))
        .filter(col("rev_e4") === col("max_e4"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .withColumn("total_revenue", e4ToDollars("rev_e4"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    },
    Some(s"""WITH r AS (
              SELECT l_suppkey, CAST(sum($revenueE4Sql) AS BIGINT) AS rev_e4
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, ${e4ToDollarsSql("rev_e4")} AS total_revenue
            FROM r JOIN supplier ON l_suppkey = s_suppkey
            WHERE rev_e4 = (SELECT max(rev_e4) FROM r)""")
  )

  /** Q16 shape — supplier-count census with a NOT IN exclusion: distinct
    * ps_suppkey per (brand, type, size) over the synthesized partsupp,
    * minus a deterministic supplier blacklist (s_suppkey % 7 = 0 stands
    * in for TPC-H's comment-pattern complaints filter — the fixture has
    * no comment column; % 7 keeps the anti-join non-vacuous). The NOT IN
    * decorrelates to a null-safe anti-join; the census is one
    * distinct-aggregate on the grouping keys. */
  val q16 = Q(
    "q16_supplier_census",
    "Distinct-count census over partsupp with NOT IN supplier blacklist -> anti-join; supplier variety per (brand, type, size).",
    (s, dir) => {
      val t = Tables(s, dir)
      val blacklist = t.supplier.filter(col("s_suppkey") % 7 === 0)
        .select(col("s_suppkey"))
      partsupp(t)
        .join(broadcast(t.part.filter(col("p_brand") =!= "Brand#13" && col("p_size") <= 25)),
          col("ps_partkey") === col("p_partkey"))
        .join(blacklist, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
    },
    Some(s"""WITH $partsuppSql
            SELECT p_brand, p_type, p_size,
                   CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
            FROM ps JOIN part ON ps_partkey = p_partkey
            WHERE p_brand <> 'Brand#13' AND p_size <= 25
              AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
            GROUP BY p_brand, p_type, p_size""")
  )

  /** Q17 shape — small-quantity-order revenue: lines below 20% of their
    * part's average quantity. The correlated avg decorrelates into ONE
    * per-part aggregate joined back; the 0.2×avg compare is done by
    * integer cross-multiplication (qty × 5 × n < sum — quantities are
    * integral), so no division boundary exists to diverge on. Final
    * /7.0 happens once, after an exact integer sum. */
  val q17 = Q(
    "q17_small_qty_revenue",
    "Correlated-avg threshold decorrelated to agg+join, exact cross-multiplied compare: weekly revenue of below-average-quantity brand lines.",
    (s, dir) => {
      val t = Tables(s, dir)
      val brandLines = t.lineitem
        .join(broadcast(t.part
          .filter(col("p_brand").isin("Brand#13", "Brand#22", "Brand#25"))
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
      val perPart = brandLines.groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
      brandLines
        .join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast("long") * 5 * col("n") < col("sum_qty"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"),
          count(lit(1)).as("n_lines"))
        .select(
          (col("cents").cast("double") / lit(100.0) / lit(7.0)).as("avg_yearly"),
          col("n_lines"))
    },
    Some("""WITH bl AS (
              SELECT l_partkey, l_quantity, l_extendedprice
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand IN ('Brand#13', 'Brand#22', 'Brand#25')
            ), pp AS (
              SELECT l_partkey AS pk, count(*) AS n,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
              FROM bl GROUP BY 1)
            SELECT CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                     / CAST(100.0 AS DOUBLE) / CAST(7.0 AS DOUBLE) AS DOUBLE) AS avg_yearly,
                   count(*) AS n_lines
            FROM bl JOIN pp ON l_partkey = pk
            WHERE CAST(l_quantity AS BIGINT) * 5 * n < sum_qty""")
  )

  /** Q21 shape — suppliers who kept orders waiting: the only supplier
    * with a late line (ship > order + 60 days — the fixture has no
    * commit/receipt dates) in a multi-supplier finalized order. The
    * classic EXISTS + NOT-EXISTS double correlation is re-expressed as
    * per-order supplier censuses (distinct suppliers, distinct LATE
    * suppliers) joined once — two aggregates + one join instead of two
    * correlated probes of the fact table; the oracle keeps the textbook
    * double-correlated form, proving the rewrite. */
  val q21 = Q(
    "q21_waiting_supplier",
    "EXISTS + NOT EXISTS double correlation as per-order censuses: sole-late-supplier counts in multi-supplier 'F' orders, top-10.",
    (s, dir) => {
      val t = Tables(s, dir)
      val fOrders = t.orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val lines = t.lineitem
        .join(fOrders, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      // ONE census pass (r12 optimization): the qualifying row per order
      // is the SOLE late supplier, and when n_late_supp == 1 that
      // supplier is min(late suppkeys) — so it rides the same aggregate
      // and the old second scan of the joined lineitem (distinct late
      // pairs + join back onto the census) disappears. Identical rows:
      // exactly one (order, supplier) per qualifying order either way.
      lines.groupBy(col("l_orderkey"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"),
          min(when(col("late"), col("l_suppkey"))).as("sole_supp"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .join(broadcast(t.supplier), col("sole_supp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(10)
    },
    Some("""SELECT s_name, count(*) AS numwait FROM (
              SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
              FROM lineitem l1
              JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
              WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
                AND EXISTS (SELECT 1 FROM lineitem l2
                            WHERE l2.l_orderkey = l1.l_orderkey
                              AND l2.l_suppkey <> l1.l_suppkey)
                AND NOT EXISTS (SELECT 1 FROM lineitem l3
                                JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                                WHERE l3.l_orderkey = l1.l_orderkey
                                  AND l3.l_suppkey <> l1.l_suppkey
                                  AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
            ) w JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_name
            ORDER BY numwait DESC, s_name ASC
            LIMIT 10""")
  )

  /** Q8 shape — national market share: one nation's revenue fraction of
    * a region×part-type market per year. The share is a conditional
    * numerator over the same aggregate's denominator (one pass, no
    * self-join); both sums are exact integer e4 units, so the single
    * final division is bit-identical across engines and round(…, 6) is
    * safe. */
  val q8 = Q(
    "q8_market_share",
    "National market share per year: 7-way join, conditional-over-total e4 revenue ratio in one aggregate pass.",
    (s, dir) => {
      val t = Tables(s, dir)
      val custNation = t.nation.select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
      val suppNation = t.nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      t.lineitem
        .join(broadcast(t.part.filter(col("p_type") === "PROMO").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", revenueE4).otherwise(lit(0L))).as("nat_e4"),
          sum(revenueE4).as("tot_e4"))
        .select(col("o_year"),
          round(col("nat_e4").cast("double") / col("tot_e4").cast("double"), 6).as("mkt_share"))
    },
    Some(s"""SELECT year(o_orderdate) AS o_year,
            round(CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN $revenueE4Sql ELSE 0 END) AS DOUBLE)
                  / CAST(sum($revenueE4Sql) AS DOUBLE), 6) AS mkt_share
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            GROUP BY year(o_orderdate)""")
  )

  /** Q9 shape — product-type profit by nation and year: revenue minus
    * supply cost, both lifted to exact e4 integer units (cost cents ×
    * qty × 100), summed per (nation, year). Joins lineitem to the
    * synthesized partsupp on (part, supplier) — inner join semantics
    * documented: only synthesized (part, supplier) slots participate,
    * deterministically on both sides. */
  val q9 = Q(
    "q9_product_profit",
    "Profit per supplier-nation per year: lineitem x partsupp(cost) x supplier x nation; exact integer e4 revenue-minus-cost.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(partsupp(t),
          col("l_partkey") === col("ps_partkey") && col("l_suppkey") === col("ps_suppkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("l_shipdate")).as("o_year"))
        .agg(sum(revenueE4 -
          col("ps_cost_cents") * col("l_quantity").cast("long") * 100L).as("profit_e4"))
        .withColumn("profit", e4ToDollars("profit_e4")).drop("profit_e4")
    },
    Some(s"""WITH $partsuppSql
            SELECT n_name, year(l_shipdate) AS o_year,
            ${e4ToDollarsSql(
              s"sum($revenueE4Sql - ps_cost_cents * CAST(l_quantity AS BIGINT) * 100)")} AS profit
            FROM lineitem
            JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name, year(l_shipdate)""")
  )

  /** Q13 shape — customer order-count distribution: LEFT OUTER join so
    * order-less customers survive into the zero bucket, then a
    * two-level aggregate (count per customer → histogram of counts).
    * The date filter belongs in the JOIN CONDITION, not a WHERE (a
    * where-filter would silently turn the outer join inner and drop the
    * zero bucket — the classic Q13 trap). */
  val q13 = Q(
    "q13_order_distribution",
    "Outer-join count histogram: per-customer recent-order counts including the zero bucket, then the distribution of those counts.",
    (s, dir) => {
      val t = Tables(s, dir)
      val recent = t.orders
        .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
        .select(col("o_custkey"), col("o_orderkey"))
      t.customer
        .join(recent, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""SELECT c_count, count(*) AS custdist FROM (
              SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
              FROM customer
              LEFT JOIN orders ON c_custkey = o_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01'
              GROUP BY c_custkey)
            GROUP BY c_count""")
  )

  def all: Seq[Q] = Seq(q2, q4, q6, q7, q8, q9, q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22)
}
