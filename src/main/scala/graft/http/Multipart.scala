package graft.http

/** Minimal RFC 7578 `multipart/form-data` parser — just enough framing for
  * the reference's upload client (one JSON field part + one text file part,
  * `/root/reference/backend/main.py:217-233`): boundary split, per-part
  * `Content-Disposition` name/filename extraction, CRLF-delimited content.
  * Text-only by design (the payloads are CSV and JSON); binary uploads are
  * out of the façade's scope.
  */
object Multipart {

  final case class FilePart(filename: String, content: String)

  final class Parts(
      fields: Map[String, String],
      files: Map[String, FilePart]) {
    def field(name: String): Option[String] = fields.get(name)
    def file(name: String): Option[FilePart] = files.get(name)
  }

  private val NameRe = """name="([^"]*)"""".r
  private val FilenameRe = """filename="([^"]*)"""".r

  /** Parse a multipart body. `contentType` must carry `boundary=…`;
    * malformed framing throws IllegalArgumentException (the 422 slot).
    */
  def parse(contentType: String, bodyText: String): Parts = {
    val boundary = contentType.split(";").map(_.trim)
      .collectFirst { case b if b.toLowerCase.startsWith("boundary=") =>
        b.substring("boundary=".length).stripPrefix("\"").stripSuffix("\"")
      }
      .getOrElse(throw new IllegalArgumentException(
        "multipart/form-data without a boundary parameter"))
    val delim = "--" + boundary
    var fields = Map.empty[String, String]
    var files = Map.empty[String, FilePart]
    // segments between boundary markers; [0] is the preamble, the final
    // segment is the "--\r\n" epilogue of the closing delimiter
    bodyText.split(java.util.regex.Pattern.quote(delim), -1).drop(1).foreach { seg =>
      if (!seg.startsWith("--")) {
        val part = seg.stripPrefix("\r\n")
        val headerEnd = part.indexOf("\r\n\r\n")
        if (headerEnd < 0)
          throw new IllegalArgumentException("multipart part without header/body separator")
        val headers = part.substring(0, headerEnd)
        // each part's content ends with the CRLF that precedes the next delimiter
        val content = part.substring(headerEnd + 4).stripSuffix("\r\n")
        val disposition = headers.linesIterator
          .find(_.toLowerCase.startsWith("content-disposition:"))
          .getOrElse(throw new IllegalArgumentException(
            "multipart part without Content-Disposition"))
        val name = NameRe.findFirstMatchIn(disposition).map(_.group(1))
          .getOrElse(throw new IllegalArgumentException(
            "multipart part without a field name"))
        FilenameRe.findFirstMatchIn(disposition) match {
          case Some(m) => files += name -> FilePart(m.group(1), content)
          case None => fields += name -> content
        }
      }
    }
    new Parts(fields, files)
  }
}
