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
 * Deliberately NOT production-grade: row-at-a-time Group materialization
 * (no vectorization, no column pruning), flat schemas only
 * (long/int/double/float/string/boolean). The point is the runtime-filter
 * plumbing, which is identical at any reader sophistication; swapping in
 * Spark's vectorized parquet reader changes throughput, not the pruning.
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
  private final List<RowGroupPartition> all;
  private List<RowGroupPartition> kept;
  private final long totalBytes;
  private final long totalRows;

  RptScan(StructType schema, CaseInsensitiveStringMap options) {
    this.schema = schema;
    String fc = options.getOrDefault("filtercolumns", "");
    this.filterCols = fc.isEmpty() ? new String[0] : fc.split(",");
    this.logFile = options.getOrDefault("logfile", "");
    this.all = new ArrayList<>();
    long bytes = 0;
    long rows = 0;
    Configuration conf = new Configuration();
    // split planning: one footer read per file on the driver — the same
    // metadata pass every parquet planner performs; row-group min/max
    // for the declared filter columns rides along for free
    for (Path f : Util.listParquet(Util.path(options))) {
      try (ParquetFileReader r = ParquetFileReader.open(conf, f)) {
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
              org.apache.parquet.column.statistics.Statistics<?> st =
                  c.getStatistics();
              if (st != null && !st.isEmpty() && st.hasNonNullValue()
                  && st.genericGetMin() instanceof Number) {
                ranges.put(col, new long[] {
                    ((Number) st.genericGetMin()).longValue(),
                    ((Number) st.genericGetMax()).longValue()});
              }
            }
          }
          all.add(new RowGroupPartition(f.toString(), i, b.getRowCount(),
              ranges));
          bytes += b.getTotalByteSize();
          rows += b.getRowCount();
        }
      } catch (IOException e) {
        throw new RuntimeException("rptparquet: footer read failed: " + f, e);
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
    return new RptReaderFactory(schema);
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
      List<RowGroupPartition> next = new ArrayList<>();
      for (RowGroupPartition part : kept) {
        long[] range = part.ranges.get(col);
        if (range == null) {
          next.add(part);  // no stats — cannot prune safely
          continue;
        }
        Long hit = vals.ceiling(range[0]);
        if (hit != null && hit <= range[1]) {
          next.add(part);
        }
      }
      audit(col, vals.size(), kept.size(), next.size());
      kept = next;
    }
  }

  private void audit(String col, int nVals, int before, int after) {
    if (logFile.isEmpty()) {
      return;
    }
    try (FileWriter w = new FileWriter(logFile, true)) {
      w.write(String.format(
          "{\"event\": \"runtime_filter\", \"col\": \"%s\", \"values\": %d,"
              + " \"row_groups_before\": %d, \"row_groups_after\": %d}%n",
          col, nVals, before, after));
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
  final HashMap<String, long[]> ranges;

  RowGroupPartition(String file, int rowGroup, long rows,
      HashMap<String, long[]> ranges) {
    this.file = file;
    this.rowGroup = rowGroup;
    this.rows = rows;
    this.ranges = ranges;
  }
}

final class RptReaderFactory implements PartitionReaderFactory {
  private final StructType schema;

  RptReaderFactory(StructType schema) {
    this.schema = schema;
  }

  @Override
  public PartitionReader<InternalRow> createReader(InputPartition partition) {
    return new RowGroupReader((RowGroupPartition) partition, schema);
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
              "rptparquet prototype: unsupported type " + t);
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
    List<StructField> fields = new ArrayList<>();
    for (Type t : m.getFields()) {
      if (!t.isPrimitive()) {
        throw new UnsupportedOperationException(
            "rptparquet prototype: flat schemas only, got " + t);
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
