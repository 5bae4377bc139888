/*
 * rptparquet: a minimal DataSource V2 parquet source whose Scan implements
 * SupportsRuntimeV2Filtering — the JVM-side hook that lets a join's
 * build-side key set reach INTO the probe scan and skip whole row groups
 * before any row is materialized.
 *
 * This is the Spark counterpart of the reference extension's dynamic
 * Bloom-filter table-filter pushdown (rpt_optimizer.cpp:1401-1501,
 * physical_create_bf.cpp:282-350): DuckDB attaches the freshly built BF
 * as a table filter on the probe scan; pure PySpark cannot reach that
 * hook (documented in operators/rewrite.py), so the engine's Python tier
 * stops at min/max constants in PushedFilters plus a filter ABOVE the
 * scan. This optional jar closes the gap for the one mechanism that
 * needs JVM code:
 *
 *  - each parquet ROW GROUP is one InputPartition carrying the footer
 *    min/max of the declared filter columns (split-level statistics);
 *  - Spark's dynamic partition pruning rule sees filterAttributes(),
 *    plans an IN-subquery runtime filter from the broadcast build side,
 *    and calls filter() with the materialized key set at execution time;
 *  - filter() drops every row group whose [min,max] cannot intersect
 *    the key set — those bytes are never read.
 *
 * Decoding delegates to Spark's own VectorizedParquetRecordReader fed one
 * row group per InputPartition (ColumnarBatch output, so scans run at the
 * native reader's throughput and the row-group pruning is pure savings);
 * a row-at-a-time fallback remains for zero-column (count-only) reads and
 * as the `vectorized=false` escape hatch (that fallback is flat-schema
 * only). Schema inference delegates to Spark's ParquetToSparkSchemaConverter,
 * so nested structs/arrays/maps and decimal/date/timestamp leaves read
 * through the vectorized path exactly as the native source would.
 *
 * Usage:
 *   spark.read.format("rptparquet")
 *        .option("filterColumns", "f_mk")      // int64 join keys
 *        .option("logFile", "/tmp/prune.log")  // optional pruning audit
 *        .load("/path/to/dir")
 */
package rptspark.dsv2;

import java.io.FileWriter;
import java.io.IOException;
import java.io.Serializable;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.EnumSet;
import java.util.HashMap;
import java.util.HashSet;
import java.util.List;
import java.util.Map;
import java.util.OptionalLong;
import java.util.Set;
import java.util.TreeSet;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.parquet.example.data.Group;
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter;
import org.apache.parquet.hadoop.ParquetFileReader;
import org.apache.parquet.hadoop.metadata.BlockMetaData;
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData;
import org.apache.parquet.io.ColumnIOFactory;
import org.apache.parquet.io.MessageColumnIO;
import org.apache.parquet.io.RecordReader;
import org.apache.parquet.schema.LogicalTypeAnnotation;
import org.apache.parquet.schema.MessageType;
import org.apache.parquet.schema.PrimitiveType;
import org.apache.parquet.schema.Type;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableProvider;
import org.apache.spark.sql.connector.expressions.Expression;
import org.apache.spark.sql.connector.expressions.FieldReference;
import org.apache.spark.sql.connector.expressions.Literal;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.expressions.filter.Predicate;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.read.Statistics;
import org.apache.spark.sql.connector.read.SupportsReportStatistics;
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering;
import org.apache.spark.sql.sources.DataSourceRegister;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;
import org.apache.spark.unsafe.types.UTF8String;

public class RptParquetProvider implements TableProvider, DataSourceRegister {

  @Override
  public String shortName() {
    return "rptparquet";
  }

  @Override
  public boolean supportsExternalMetadata() {
    return true;
  }

  @Override
  public StructType inferSchema(CaseInsensitiveStringMap options) {
    List<Path> files = Util.listParquet(Util.path(options));
    if (files.isEmpty()) {
      throw new IllegalArgumentException(
          "rptparquet: no parquet files under " + Util.path(options));
    }
    try (ParquetFileReader r =
        ParquetFileReader.open(new Configuration(), files.get(0))) {
      return Util.toSpark(r.getFooter().getFileMetaData().getSchema());
    } catch (IOException e) {
      throw new RuntimeException("rptparquet: footer read failed", e);
    }
  }

  @Override
  public Table getTable(StructType schema, Transform[] partitioning,
      Map<String, String> properties) {
    return new RptTable(schema, properties);
  }
}

final class RptTable implements SupportsRead {
  private final StructType schema;
  private final Map<String, String> props;

  RptTable(StructType schema, Map<String, String> props) {
    this.schema = schema;
    this.props = props;
  }

  @Override
  public String name() {
    return "rptparquet:" + props.getOrDefault("path", "?");
  }

  @Override
  public StructType schema() {
    return schema;
  }

  @Override
  public Set<TableCapability> capabilities() {
    return EnumSet.of(TableCapability.BATCH_READ);
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    CaseInsensitiveStringMap merged =
        new CaseInsensitiveStringMap(Util.merge(props, options));
    return new RptScanBuilder(schema, merged);
  }
}

final class RptScanBuilder
    implements ScanBuilder,
        org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private StructType schema;
  private final CaseInsensitiveStringMap options;

  RptScanBuilder(StructType schema, CaseInsensitiveStringMap options) {
    this.schema = schema;
    this.options = options;
  }

  @Override
  public void pruneColumns(StructType requiredSchema) {
    // column pruning: only the projected columns' pages are read —
    // the reader sets a projected MessageType on the parquet reader,
    // so unneeded column chunks are never fetched
    this.schema = requiredSchema;
  }

  @Override
  public Scan build() {
    return new RptScan(schema, options);
  }
}

final class RptScan
    implements Scan, Batch, SupportsRuntimeV2Filtering, SupportsReportStatistics {

  private final StructType schema;
  private final String[] filterCols;
  private final String logFile;
  private final boolean vectorized;
  private final boolean rowFilter;
  private final double rowFilterDisableAt;
  private final long rowFilterObserve;
  private final List<RowGroupPartition> all;
  private List<RowGroupPartition> kept;
  private final HashMap<String, long[]> rowSets = new HashMap<>();
  private final long totalBytes;
  private final long totalRows;

  RptScan(StructType schema, CaseInsensitiveStringMap options) {
    this.schema = schema;
    String fc = options.getOrDefault("filtercolumns", "");
    this.filterCols = fc.isEmpty() ? new String[0] : fc.split(",");
    this.logFile = options.getOrDefault("logfile", "");
    this.vectorized =
        !"false".equalsIgnoreCase(options.getOrDefault("vectorized", "true"));
    // in-scan row filtering (the reference's SelectivityOptionalFilter,
    // physical_create_bf.cpp:324-329): rows whose key cannot be in the
    // runtime key set are dropped BEFORE they reach the first exchange,
    // and each task stops probing when the observed pass rate says the
    // filter is not paying for itself
    this.rowFilter =
        !"false".equalsIgnoreCase(options.getOrDefault("rowfilter", "true"));
    this.rowFilterDisableAt = Double.parseDouble(
        options.getOrDefault("rowfilterdisableat", "0.75"));
    this.rowFilterObserve = Long.parseLong(
        options.getOrDefault("rowfilterobserve", "131072"));
    this.all = new ArrayList<>();
    long bytes = 0;
    long rows = 0;
    // split planning: one footer read per file on the driver — the same
    // metadata pass every parquet planner performs; row-group min/max
    // for the declared filter columns rides along for free. Footers are
    // cached by (path, mtime, length) across queries, the role a
    // FileIndex plays for the native source — DSv2 constructs a fresh
    // Scan per execution, and re-reading every footer each time showed
    // up as fixed driver latency on repeated queries.
    for (Path f : Util.listParquet(Util.path(options))) {
      for (RowGroupPartition p : Util.footerPartitions(f, filterCols)) {
        all.add(p);
        bytes += p.rgUncompressedBytes;
        rows += p.rows;
      }
    }
    this.kept = all;
    this.totalBytes = bytes;
    this.totalRows = rows;
  }

  @Override
  public StructType readSchema() {
    return schema;
  }

  @Override
  public String description() {
    return "rptparquet runtime-filtered scan (" + all.size() + " row groups)";
  }

  @Override
  public Batch toBatch() {
    return this;
  }

  @Override
  public InputPartition[] planInputPartitions() {
    return kept.toArray(new InputPartition[0]);
  }

  @Override
  public PartitionReaderFactory createReaderFactory() {
    // capture the session's SQL confs driver-side: the vectorized
    // reader's schema converter resolves spark.sql.* keys from the
    // task-side Hadoop configuration, which Spark's native scan
    // pre-populates the same way
    HashMap<String, String> sqlConf = new HashMap<>();
    try {
      org.apache.spark.sql.classic.SparkSession session =
          (org.apache.spark.sql.classic.SparkSession)
              org.apache.spark.sql.SparkSession.active();
      scala.collection.Iterator<scala.Tuple2<String, String>> it =
          session.sessionState().conf().getAllConfs().iterator();
      while (it.hasNext()) {
        scala.Tuple2<String, String> kv = it.next();
        if (kv._1().startsWith("spark.sql.")) {
          sqlConf.put(kv._1(), kv._2());
        }
      }
    } catch (RuntimeException ignored) {
      // no active session (shouldn't happen on the driver) — the
      // reader falls back to explicit defaults for the known keys
    }
    // the LIVE rowSets reference, not a snapshot: BatchScanExec forces
    // readerFactory during PLANNING (its supportsColumnar check), which
    // is before filter() delivers the runtime key set. The factory is
    // only serialized to tasks at job submission — after filter() has
    // populated the map — so the readers see the final contents; if a
    // plan ever executes without runtime filters the map is just empty
    // and the scan stays a plain pruned scan
    return new RptReaderFactory(schema, vectorized, sqlConf,
        rowFilter ? rowSets : new HashMap<>(),
        rowFilterDisableAt, rowFilterObserve, logFile);
  }

  @Override
  public NamedReference[] filterAttributes() {
    NamedReference[] refs = new NamedReference[filterCols.length];
    for (int i = 0; i < filterCols.length; i++) {
      refs[i] = FieldReference.column(filterCols[i].trim());
    }
    return refs;
  }

  @Override
  public void filter(Predicate[] predicates) {
    // Spark materializes the broadcast build side, turns its key set
    // into IN(col, v1..vn), and hands it here before re-planning input
    // partitions — the moment the reference reaches with its BF table
    // filter. Pruning must stay conservative: unknown predicate shapes
    // and statless row groups are kept.
    // Each delivery fully REPLACES the previous filter set: if the scan
    // is re-planned with different runtime predicates (scan reuse / AQE
    // replan), a stale exact key set for a column absent from the new
    // predicates must not keep dropping rows at read time. rowSets is
    // cleared in place (the reader factory holds the live reference).
    rowSets.clear();
    kept = all;
    for (Predicate p : predicates) {
      if (!"IN".equalsIgnoreCase(p.name())) {
        continue;
      }
      Expression[] ch = p.children();
      if (ch.length < 2 || !(ch[0] instanceof NamedReference)) {
        continue;
      }
      String col = String.join(".", ((NamedReference) ch[0]).fieldNames());
      TreeSet<Long> vals = new TreeSet<>();
      boolean allNumeric = true;
      for (int i = 1; i < ch.length; i++) {
        Object v = (ch[i] instanceof Literal)
            ? ((Literal<?>) ch[i]).value() : null;
        if (v instanceof Number) {
          vals.add(((Number) v).longValue());
        } else {
          allNumeric = false;
          break;
        }
      }
      if (!allNumeric || vals.isEmpty()) {
        continue;
      }
      if (rowFilter) {
        // keep the exact key set for per-row probing in the readers —
        // a sorted primitive array: binary-search probes, no boxing,
        // serialized once per stage inside the reader factory
        long[] arr = new long[vals.size()];
        int j = 0;
        for (long v : vals) {
          arr[j++] = v;
        }
        rowSets.put(col, arr);
      }
      List<RowGroupPartition> next = new ArrayList<>();
      long rowsBefore = 0;
      long rowsAfter = 0;
      for (RowGroupPartition part : kept) {
        rowsBefore += part.rows;
        long[] range = part.ranges.get(col);
        if (range == null) {
          next.add(part);  // no stats — cannot prune safely
          rowsAfter += part.rows;
          continue;
        }
        Long hit = vals.ceiling(range[0]);
        if (hit != null && hit <= range[1]) {
          next.add(part);
          rowsAfter += part.rows;
        }
      }
      audit(col, vals.size(), kept.size(), next.size(), rowsBefore,
          rowsAfter);
      kept = next;
    }
  }

  private void audit(String col, int nVals, int before, int after,
      long rowsBefore, long rowsAfter) {
    if (logFile.isEmpty()) {
      return;
    }
    try (FileWriter w = new FileWriter(logFile, true)) {
      w.write(String.format(
          "{\"event\": \"runtime_filter\", \"col\": \"%s\", \"values\": %d,"
              + " \"row_groups_before\": %d, \"row_groups_after\": %d,"
              + " \"rows_before\": %d, \"rows_after\": %d}%n",
          col, nVals, before, after, rowsBefore, rowsAfter));
    } catch (IOException ignored) {
      // the audit trail is best-effort; never fail the query over it
    }
  }

  @Override
  public Statistics estimateStatistics() {
    // honest (uncompressed) size so the optimizer never broadcasts this
    // side by accident — the fact table is the probe, not the build
    return new Statistics() {
      @Override
      public OptionalLong sizeInBytes() {
        return OptionalLong.of(Math.max(totalBytes, 1L));
      }

      @Override
      public OptionalLong numRows() {
        return OptionalLong.of(totalRows);
      }
    };
  }
}

final class RowGroupPartition implements InputPartition, Serializable {
  final String file;
  final int rowGroup;
  final long rows;
  final long rgStart;   // on-disk byte offset of the row group
  final long rgBytes;   // compressed byte length (split range for the
                        // vectorized reader's midpoint row-group pick)
  final long rgUncompressedBytes;
  final HashMap<String, long[]> ranges;

  RowGroupPartition(String file, int rowGroup, long rows, long rgStart,
      long rgBytes, long rgUncompressedBytes,
      HashMap<String, long[]> ranges) {
    this.file = file;
    this.rowGroup = rowGroup;
    this.rows = rows;
    this.rgStart = rgStart;
    this.rgBytes = rgBytes;
    this.rgUncompressedBytes = rgUncompressedBytes;
    this.ranges = ranges;
  }
}

final class RptReaderFactory implements PartitionReaderFactory {
  private final StructType schema;
  private final boolean vectorized;
  private final HashMap<String, String> sqlConf;
  private final HashMap<String, long[]> rowSets;
  private final double disableAt;
  private final long observeRows;
  private final String logFile;

  RptReaderFactory(StructType schema, boolean vectorized,
      HashMap<String, String> sqlConf, HashMap<String, long[]> rowSets,
      double disableAt, long observeRows, String logFile) {
    this.schema = schema;
    this.vectorized = vectorized;
    this.sqlConf = sqlConf;
    this.rowSets = rowSets;
    this.disableAt = disableAt;
    this.observeRows = observeRows;
    this.logFile = logFile;
  }

  @Override
  public boolean supportColumnarReads(InputPartition partition) {
    // columnar whenever there are columns to decode; a zero-column
    // (count-only) projection stays on the trivial row path, which
    // reads no pages at all
    return vectorized && schema.size() > 0;
  }

  @Override
  public PartitionReader<org.apache.spark.sql.vectorized.ColumnarBatch>
      createColumnarReader(InputPartition partition) {
    VectorizedRowGroupReader inner = new VectorizedRowGroupReader(
        (RowGroupPartition) partition, schema, sqlConf);
    if (rowSets.isEmpty()) {
      return inner;
    }
    AdaptiveRowFilterReader wrapped = AdaptiveRowFilterReader.tryWrap(
        inner, schema, rowSets, disableAt, observeRows, logFile);
    return wrapped != null ? wrapped : inner;
  }

  @Override
  public PartitionReader<InternalRow> createReader(InputPartition partition) {
    return new RowGroupReader((RowGroupPartition) partition, schema);
  }
}

/**
 * Per-row runtime key-set filtering inside the scan, with adaptive
 * self-disable — the Spark counterpart of the reference wrapping its
 * pushed Bloom filters in SelectivityOptionalFilter
 * (physical_create_bf.cpp:324-329) so an unselective filter stops being
 * applied mid-scan. Row groups that survive min/max pruning still hold
 * rows the runtime IN-set rejects; dropping them HERE means they never
 * enter the first exchange — the row-level reduction the engine's
 * shuffle-semi tier used to buy with an extra exchange (gate 2b3 skips
 * that tier precisely because the exchange out-costs it; this filter is
 * exchange-free). Each task observes its own pass rate over the first
 * {@code observeRows} rows and delivers raw batches from then on if the
 * filter keeps more than {@code disableAt} of them: scan-local
 * adaptivity, no coordination, exactly the reference's mechanism.
 */
final class AdaptiveRowFilterReader
    implements PartitionReader<org.apache.spark.sql.vectorized.ColumnarBatch> {

  private final PartitionReader<org.apache.spark.sql.vectorized.ColumnarBatch>
      inner;
  private final StructType schema;
  private final int[] keyIdx;      // schema position of each filter column
  private final long[][] keySets;  // sorted key arrays, same order
  private final double disableAt;
  private final long observeRows;
  private final String logFile;

  private long rowsSeen;
  private long rowsPassed;
  private boolean disabled;
  private org.apache.spark.sql.vectorized.ColumnarBatch out;
  private org.apache.spark.sql.execution.vectorized.OnHeapColumnVector[]
      outVecs;

  /** Returns null (no wrapping) unless every filter column is projected
   * and every projected column has a compaction-supported flat type —
   * unsupported shapes keep the plain pruned scan, never fail. */
  static AdaptiveRowFilterReader tryWrap(
      PartitionReader<org.apache.spark.sql.vectorized.ColumnarBatch> inner,
      StructType schema, HashMap<String, long[]> rowSets, double disableAt,
      long observeRows, String logFile) {
    List<Integer> idx = new ArrayList<>();
    List<long[]> sets = new ArrayList<>();
    for (Map.Entry<String, long[]> e : rowSets.entrySet()) {
      int at = -1;
      for (int i = 0; i < schema.size(); i++) {
        if (schema.fields()[i].name().equalsIgnoreCase(e.getKey())) {
          at = i;
          break;
        }
      }
      if (at < 0) {
        return null;  // key column pruned away: nothing to probe
      }
      DataType kt = schema.fields()[at].dataType();
      if (!kt.equals(DataTypes.LongType) && !kt.equals(DataTypes.IntegerType)) {
        return null;
      }
      idx.add(at);
      sets.add(e.getValue());
    }
    for (StructField f : schema.fields()) {
      if (!compactable(f.dataType())) {
        return null;
      }
    }
    int[] ki = new int[idx.size()];
    long[][] ks = new long[sets.size()][];
    for (int i = 0; i < ki.length; i++) {
      ki[i] = idx.get(i);
      ks[i] = sets.get(i);
    }
    return new AdaptiveRowFilterReader(inner, schema, ki, ks, disableAt,
        observeRows, logFile);
  }

  private static boolean compactable(DataType t) {
    return t.equals(DataTypes.LongType) || t.equals(DataTypes.IntegerType)
        || t.equals(DataTypes.DoubleType) || t.equals(DataTypes.FloatType)
        || t.equals(DataTypes.BooleanType) || t.equals(DataTypes.StringType)
        || t.equals(DataTypes.DateType) || t.equals(DataTypes.TimestampType)
        || t.equals(DataTypes.ShortType) || t.equals(DataTypes.ByteType);
  }

  private AdaptiveRowFilterReader(
      PartitionReader<org.apache.spark.sql.vectorized.ColumnarBatch> inner,
      StructType schema, int[] keyIdx, long[][] keySets, double disableAt,
      long observeRows, String logFile) {
    this.inner = inner;
    this.schema = schema;
    this.keyIdx = keyIdx;
    this.keySets = keySets;
    this.disableAt = disableAt;
    this.observeRows = observeRows;
    this.logFile = logFile;
  }

  @Override
  public boolean next() throws IOException {
    closeOut();
    while (inner.next()) {
      org.apache.spark.sql.vectorized.ColumnarBatch batch = inner.get();
      if (disabled) {
        out = batch;
        return true;
      }
      int n = batch.numRows();
      boolean[] keep = new boolean[n];
      int passed = 0;
      for (int r = 0; r < n; r++) {
        boolean ok = true;
        for (int k = 0; k < keyIdx.length && ok; k++) {
          org.apache.spark.sql.vectorized.ColumnVector v =
              batch.column(keyIdx[k]);
          if (v.isNullAt(r)) {
            ok = false;  // IN(null, ...) is never TRUE: the row cannot join
          } else {
            long key = v.dataType().equals(DataTypes.IntegerType)
                ? v.getInt(r) : v.getLong(r);
            ok = Arrays.binarySearch(keySets[k], key) >= 0;
          }
        }
        keep[r] = ok;
        if (ok) {
          passed++;
        }
      }
      rowsSeen += n;
      rowsPassed += passed;
      if (rowsSeen >= observeRows
          && rowsPassed > disableAt * rowsSeen) {
        // unselective: from here on the exchange/join above pays less
        // than per-row probing costs — stop filtering for this task
        disabled = true;
      }
      if (passed == n) {
        out = batch;  // nothing to drop: zero-copy passthrough
        return true;
      }
      if (passed == 0) {
        continue;  // whole batch rejected: fetch the next one
      }
      out = compact(batch, keep, passed);
      return true;
    }
    return false;
  }

  private org.apache.spark.sql.vectorized.ColumnarBatch compact(
      org.apache.spark.sql.vectorized.ColumnarBatch batch, boolean[] keep,
      int passed) {
    int n = batch.numRows();
    outVecs = org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
        .allocateColumns(passed, schema);
    for (int c = 0; c < schema.size(); c++) {
      org.apache.spark.sql.vectorized.ColumnVector src = batch.column(c);
      org.apache.spark.sql.execution.vectorized.OnHeapColumnVector dst =
          outVecs[c];
      DataType t = schema.fields()[c].dataType();
      int w = 0;
      for (int r = 0; r < n; r++) {
        if (!keep[r]) {
          continue;
        }
        if (src.isNullAt(r)) {
          dst.putNull(w++);
          continue;
        }
        if (t.equals(DataTypes.LongType) || t.equals(DataTypes.TimestampType)) {
          dst.putLong(w, src.getLong(r));
        } else if (t.equals(DataTypes.IntegerType)
            || t.equals(DataTypes.DateType)) {
          dst.putInt(w, src.getInt(r));
        } else if (t.equals(DataTypes.DoubleType)) {
          dst.putDouble(w, src.getDouble(r));
        } else if (t.equals(DataTypes.FloatType)) {
          dst.putFloat(w, src.getFloat(r));
        } else if (t.equals(DataTypes.BooleanType)) {
          dst.putBoolean(w, src.getBoolean(r));
        } else if (t.equals(DataTypes.ShortType)) {
          dst.putShort(w, src.getShort(r));
        } else if (t.equals(DataTypes.ByteType)) {
          dst.putByte(w, src.getByte(r));
        } else {  // StringType (tryWrap admitted nothing else)
          byte[] b = src.getUTF8String(r).getBytes();
          dst.putByteArray(w, b, 0, b.length);
        }
        w++;
      }
    }
    return new org.apache.spark.sql.vectorized.ColumnarBatch(outVecs, passed);
  }

  private void closeOut() {
    if (outVecs != null) {
      for (org.apache.spark.sql.execution.vectorized.OnHeapColumnVector v
          : outVecs) {
        v.close();
      }
      outVecs = null;
    }
    out = null;
  }

  @Override
  public org.apache.spark.sql.vectorized.ColumnarBatch get() {
    return out;
  }

  @Override
  public void close() throws IOException {
    closeOut();
    if (!logFile.isEmpty() && rowsSeen > 0) {
      try (FileWriter w = new FileWriter(logFile, true)) {
        w.write(String.format(
            "{\"event\": \"row_filter\", \"rows_seen\": %d,"
                + " \"rows_passed\": %d, \"adaptively_disabled\": %b}%n",
            rowsSeen, rowsPassed, disabled));
      } catch (IOException ignored) {
        // best-effort audit, never fail the task
      }
    }
    inner.close();
  }
}

/**
 * One parquet row group decoded by Spark's own VectorizedParquetRecordReader
 * (the engine behind the native parquet scan): this source keeps the
 * split-planning and runtime row-group pruning, Spark keeps the page
 * decoding — so the pruned scan runs at native-reader throughput and every
 * skipped row group is pure savings. All-public-API wiring: a FileSplit
 * spanning exactly the row group's byte range (parquet assigns a row group
 * to the split containing its midpoint) and the requested Spark schema via
 * the ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA configuration key —
 * the same handshake Spark's native FileSourceScan performs.
 */
final class VectorizedRowGroupReader
    implements PartitionReader<org.apache.spark.sql.vectorized.ColumnarBatch> {
  private final org.apache.spark.sql.execution.datasources.parquet
      .VectorizedParquetRecordReader vec;

  VectorizedRowGroupReader(RowGroupPartition part, StructType schema,
      HashMap<String, String> sqlConf) {
    try {
      Configuration conf = new Configuration();
      // defaults for the keys the parquet-to-Spark schema converter
      // resolves with a bare .toBoolean (no default of its own), in
      // case the driver-captured conf is missing any
      conf.set("spark.sql.parquet.binaryAsString", "false");
      conf.set("spark.sql.parquet.int96AsTimestamp", "true");
      conf.set("spark.sql.caseSensitive", "false");
      conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true");
      conf.set("spark.sql.legacy.parquet.nanosAsLong", "false");
      for (Map.Entry<String, String> kv : sqlConf.entrySet()) {
        if (kv.getValue() != null) {
          conf.set(kv.getKey(), kv.getValue());
        }
      }
      conf.set(
          org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport
              .SPARK_ROW_REQUESTED_SCHEMA(),
          schema.json());
      conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
          org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport
              .class.getName());
      // the old-API FileSplit (it extends the mapreduce one): Spark's
      // reader base downcasts to it for locality info
      org.apache.hadoop.mapred.FileSplit split =
          new org.apache.hadoop.mapred.FileSplit(
              new Path(part.file), part.rgStart, part.rgBytes, new String[0]);
      this.vec = new org.apache.spark.sql.execution.datasources.parquet
          .VectorizedParquetRecordReader(false, 4096);
      vec.initialize(split,
          new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
              conf, new org.apache.hadoop.mapreduce.TaskAttemptID()));
      vec.initBatch(new StructType(), new GenericInternalRow(0));
      vec.enableReturningBatches();
    } catch (IOException | InterruptedException e) {
      throw new RuntimeException("rptparquet: row group open failed", e);
    }
  }

  @Override
  public boolean next() throws IOException {
    return vec.nextBatch();
  }

  @Override
  public org.apache.spark.sql.vectorized.ColumnarBatch get() {
    return (org.apache.spark.sql.vectorized.ColumnarBatch)
        vec.getCurrentValue();
  }

  @Override
  public void close() throws IOException {
    vec.close();
  }
}

final class RowGroupReader implements PartitionReader<InternalRow> {
  private final ParquetFileReader reader;
  private final RecordReader<Group> records;
  private final int[] kinds;  // index into schema -> type dispatch
  private long remaining;
  private Group current;

  private static final int K_LONG = 0;
  private static final int K_INT = 1;
  private static final int K_DOUBLE = 2;
  private static final int K_FLOAT = 3;
  private static final int K_STRING = 4;
  private static final int K_BOOL = 5;

  RowGroupReader(RowGroupPartition part, StructType schema) {
    try {
      this.reader =
          ParquetFileReader.open(new Configuration(), new Path(part.file));
      MessageType fileSchema =
          reader.getFooter().getFileMetaData().getSchema();
      if (schema.size() == 0) {
        // pure-count projection: no pages needed, just the row count
        this.records = null;
        this.remaining =
            reader.getFooter().getBlocks().get(part.rowGroup).getRowCount();
        this.kinds = new int[0];
        return;
      }
      // projected read: only the pruned columns' chunks are fetched
      List<Type> wanted = new ArrayList<>();
      for (StructField f : schema.fields()) {
        wanted.add(fileSchema.getType(f.name()));
      }
      MessageType projected =
          new MessageType(fileSchema.getName(), wanted);
      reader.setRequestedSchema(projected);
      org.apache.parquet.column.page.PageReadStore pages =
          reader.readRowGroup(part.rowGroup);
      MessageColumnIO io = new ColumnIOFactory().getColumnIO(projected);
      this.records =
          io.getRecordReader(pages, new GroupRecordConverter(projected));
      this.remaining = pages.getRowCount();
      this.kinds = new int[schema.size()];
      for (int i = 0; i < schema.size(); i++) {
        DataType t = schema.fields()[i].dataType();
        if (t.equals(DataTypes.LongType)) {
          kinds[i] = K_LONG;
        } else if (t.equals(DataTypes.IntegerType)) {
          kinds[i] = K_INT;
        } else if (t.equals(DataTypes.DoubleType)) {
          kinds[i] = K_DOUBLE;
        } else if (t.equals(DataTypes.FloatType)) {
          kinds[i] = K_FLOAT;
        } else if (t.equals(DataTypes.StringType)) {
          kinds[i] = K_STRING;
        } else if (t.equals(DataTypes.BooleanType)) {
          kinds[i] = K_BOOL;
        } else {
          throw new UnsupportedOperationException(
              "rptparquet row-fallback reads flat long/int/double/float/"
              + "string/boolean only; keep vectorized=true (the default) "
              + "for " + t);
        }
      }
    } catch (IOException e) {
      throw new RuntimeException("rptparquet: row group open failed", e);
    }
  }

  @Override
  public boolean next() {
    if (remaining <= 0) {
      return false;
    }
    remaining--;
    if (records == null) {
      return true;  // zero-column read: rows exist, no fields
    }
    current = records.read();
    return current != null;
  }

  @Override
  public InternalRow get() {
    Object[] vals = new Object[kinds.length];
    for (int i = 0; i < kinds.length; i++) {
      if (current.getFieldRepetitionCount(i) == 0) {
        vals[i] = null;
        continue;
      }
      switch (kinds[i]) {
        case K_LONG: vals[i] = current.getLong(i, 0); break;
        case K_INT: vals[i] = current.getInteger(i, 0); break;
        case K_DOUBLE: vals[i] = current.getDouble(i, 0); break;
        case K_FLOAT: vals[i] = current.getFloat(i, 0); break;
        case K_STRING:
          vals[i] = UTF8String.fromString(current.getString(i, 0));
          break;
        default: vals[i] = current.getBoolean(i, 0); break;
      }
    }
    return new GenericInternalRow(vals);
  }

  @Override
  public void close() throws IOException {
    reader.close();
  }
}

final class Util {
  private Util() {}

  /** (path, mtime, length) -> that file's row-group partitions, with
   * min/max ranges for the filter columns requested at cache time.
   * Keyed additionally by the filter-column list so scans declaring
   * different filterColumns never share stale range maps. */
  private static final java.util.concurrent.ConcurrentHashMap<String,
      List<RowGroupPartition>> FOOTERS =
          new java.util.concurrent.ConcurrentHashMap<>();

  static List<RowGroupPartition> footerPartitions(Path f,
      String[] filterCols) {
    try {
      FileSystem fs = f.getFileSystem(new Configuration());
      FileStatus st = fs.getFileStatus(f);
      String key = f + "@" + st.getModificationTime() + ":" + st.getLen()
          + "#" + String.join(",", filterCols);
      List<RowGroupPartition> cached = FOOTERS.get(key);
      if (cached != null) {
        return cached;
      }
      List<RowGroupPartition> out = new ArrayList<>();
      try (ParquetFileReader r =
          ParquetFileReader.open(new Configuration(), f)) {
        List<BlockMetaData> blocks = r.getFooter().getBlocks();
        for (int i = 0; i < blocks.size(); i++) {
          BlockMetaData b = blocks.get(i);
          HashMap<String, long[]> ranges = new HashMap<>();
          for (ColumnChunkMetaData c : b.getColumns()) {
            String col = String.join(".", c.getPath().toArray());
            for (String want : filterCols) {
              if (!col.equals(want.trim())) {
                continue;
              }
              org.apache.parquet.column.statistics.Statistics<?> stats =
                  c.getStatistics();
              if (stats != null && !stats.isEmpty()
                  && stats.hasNonNullValue()
                  && stats.genericGetMin() instanceof Number) {
                ranges.put(col, new long[] {
                    ((Number) stats.genericGetMin()).longValue(),
                    ((Number) stats.genericGetMax()).longValue()});
              }
            }
          }
          out.add(new RowGroupPartition(f.toString(), i, b.getRowCount(),
              b.getStartingPos(), Math.max(b.getCompressedSize(), 1L),
              b.getTotalByteSize(), ranges));
        }
      }
      FOOTERS.put(key, out);
      return out;
    } catch (IOException e) {
      throw new RuntimeException("rptparquet: footer read failed: " + f, e);
    }
  }

  static String path(Map<String, String> options) {
    String p = options.get("path");
    if (p == null) {
      p = options.get("paths");
    }
    if (p == null) {
      throw new IllegalArgumentException("rptparquet: 'path' is required");
    }
    return p;
  }

  static Map<String, String> merge(Map<String, String> a,
      Map<String, String> b) {
    HashMap<String, String> m = new HashMap<>(a);
    m.putAll(b);
    return m;
  }

  static List<Path> listParquet(String dir) {
    try {
      Path p = new Path(dir);
      FileSystem fs = p.getFileSystem(new Configuration());
      List<Path> out = new ArrayList<>();
      if (fs.getFileStatus(p).isFile()) {
        out.add(p);
        return out;
      }
      for (FileStatus s : fs.listStatus(p)) {
        if (s.isFile() && s.getPath().getName().endsWith(".parquet")) {
          out.add(s.getPath());
        }
      }
      out.sort((x, y) -> x.toString().compareTo(y.toString()));
      return out;
    } catch (IOException e) {
      throw new RuntimeException("rptparquet: listing failed: " + dir, e);
    }
  }

  static StructType toSpark(MessageType m) {
    // nested schemas (struct/array/map, incl. decimal/date/timestamp
    // leaves): delegate to Spark's own parquet->Catalyst converter — the
    // exact mapping the native source uses — so inference agrees with
    // what the VectorizedParquetRecordReader will decode. The hand-rolled
    // flat mapping below stays as the no-session fallback.
    try {
      org.apache.spark.sql.internal.SQLConf sqlConf =
          org.apache.spark.sql.internal.SQLConf.get();
      StructType converted = new org.apache.spark.sql.execution.datasources
          .parquet.ParquetToSparkSchemaConverter(sqlConf).convert(m);
      // file-based sources always surface nullable schemas (a file may
      // be missing a column); match the native reader exactly
      return (StructType) converted.asNullable();
    } catch (RuntimeException fallThrough) {
      // no active session / converter unavailable: flat subset below
    }
    return toSparkFlat(m);
  }

  private static StructType toSparkFlat(MessageType m) {
    List<StructField> fields = new ArrayList<>();
    for (Type t : m.getFields()) {
      if (!t.isPrimitive()) {
        throw new UnsupportedOperationException(
            "rptparquet: nested field " + t.getName()
            + " needs an active SparkSession for schema inference"
            + " (or pass an explicit schema)");
      }
      PrimitiveType p = t.asPrimitiveType();
      DataType dt;
      switch (p.getPrimitiveTypeName()) {
        case INT64: dt = DataTypes.LongType; break;
        case INT32: dt = DataTypes.IntegerType; break;
        case DOUBLE: dt = DataTypes.DoubleType; break;
        case FLOAT: dt = DataTypes.FloatType; break;
        case BOOLEAN: dt = DataTypes.BooleanType; break;
        case BINARY:
          if (p.getLogicalTypeAnnotation()
              instanceof LogicalTypeAnnotation.StringLogicalTypeAnnotation) {
            dt = DataTypes.StringType;
            break;
          }
          throw new UnsupportedOperationException(
              "rptparquet prototype: non-string binary " + p);
        default:
          throw new UnsupportedOperationException(
              "rptparquet prototype: unsupported " + p);
      }
      fields.add(new StructField(t.getName(), dt,
          !t.isRepetition(Type.Repetition.REQUIRED),
          org.apache.spark.sql.types.Metadata.empty()));
    }
    return new StructType(fields.toArray(new StructField[0]));
  }
}
