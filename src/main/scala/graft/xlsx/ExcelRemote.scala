package graft.xlsx

import java.nio.file.{Files, Paths}

/** The workbook transport abstraction (reference `_pick_client`,
  * ducklakexl.py:85-97): the catalog sync layer only needs these five
  * operations, so local-file and Microsoft-Graph workbooks are
  * interchangeable behind them — exactly how the reference treats its two
  * modes (same pull/push, different IO: ducklakexl.py:424-456,527-536).
  */
trait ExcelRemote {
  def exists: Boolean
  def sheetNames: Seq[String]
  def readAll(): Seq[XlsxCodec.Sheet]
  /** full overwrite of the workbook (the reference's push semantics —
    * clear + rewrite every sheet, ducklakexl.py:553-582)
    */
  def writeAll(sheets: Seq[XlsxCodec.Sheet]): Unit
}

/** local .xlsx on the filesystem (reference "excel" client) */
final class LocalXlsxRemote(path: String) extends ExcelRemote {
  def exists: Boolean = Files.exists(Paths.get(path))
  def sheetNames: Seq[String] = XlsxCodec.sheetNames(path)
  def readAll(): Seq[XlsxCodec.Sheet] = XlsxCodec.read(path)
  def writeAll(sheets: Seq[XlsxCodec.Sheet]): Unit = XlsxCodec.write(path, sheets)
}

/** OneDrive/SharePoint workbook over the Microsoft Graph REST API
  * (reference A3-A6, A8-A9: MSAL device auth, drive-item resolution,
  * workbook sessions, 404/401/429 retry — ducklakexl.py:100-354).
  *
  * Deliberate stub: the transport is orthogonal to every capability the
  * offline tests can observe, and no HTTP/MSAL dependency is available in
  * this build (SURVEY.md §7.0). The sync layer is already written against
  * [[ExcelRemote]], so a real implementation (java.net.http + an OAuth
  * device-code flow, sheet fan-out with bounded concurrency, retry with
  * exponential backoff honoring Retry-After) drops in without touching
  * any caller.
  */
final class GraphRemote(driveId: String, itemPath: String) extends ExcelRemote {
  private def unsupported: Nothing = throw new UnsupportedOperationException(
    "GraphRemote requires network + MSAL credentials; use LocalXlsxRemote " +
    "in offline builds (SURVEY.md §7.0)")
  def exists: Boolean = unsupported
  def sheetNames: Seq[String] = unsupported
  def readAll(): Seq[XlsxCodec.Sheet] = unsupported
  def writeAll(sheets: Seq[XlsxCodec.Sheet]): Unit = unsupported
}

object ExcelRemote {
  /** reference client pick (ducklakexl.py:85-97): explicit driveId ->
    * Graph; a plain *.xlsx path that is not a URL -> local; else Graph
    */
  def pick(excelPath: String, driveId: Option[String] = None): ExcelRemote =
    driveId match {
      case Some(d) => new GraphRemote(d, excelPath)
      case None if excelPath.toLowerCase.endsWith(".xlsx") &&
                   !excelPath.matches("^[a-z]+://.*") =>
        new LocalXlsxRemote(excelPath)
      case None => new GraphRemote("", excelPath)
    }
}
