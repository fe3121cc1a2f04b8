#!/usr/bin/env python3
"""Re-encode a graft-written workbook the way EXCEL saves files (r14
VERDICT item 7 — the codec was spec-tested on its own inlineStr-only
output; this produces the foreign-writer half).

Excel-authored features reproduced (all measured against real Excel 365
output structure):
  - [Content_Types].xml with theme/styles/sharedStrings/docProps parts
  - docProps/core.xml + app.xml, _rels to them
  - xl/workbook.xml with fileVersion/bookViews and the mc:Ignorable +
    xr/xr6/xr10/xr2 revision namespaces Excel stamps
  - xl/styles.xml with fonts/fills/borders/cellXfs so cells carry s=
  - xl/sharedStrings.xml: every string cell is t="s" into the shared
    table; one entry is split into RICH RUNS (<r><rPr>…), one carries a
    PHONETIC run (<rPh> + <phoneticPr>) that decoders must skip
  - worksheets with dimension / sheetViews / sheetFormatPr / cols and
    row spans= attributes; boolean-looking cells become native t="b",
    integer-looking cells become bare number cells; empty cells are
    OMITTED (sparse rows)

Usage: python3 tools/make_excel_fixture.py <in.xlsx> <out.xlsx>
NOT part of the shipped library; driver-side python only.
"""
import re
import sys
import xml.etree.ElementTree as ET
import zipfile

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def read_sheets(path):
    """(name, rows) per sheet from the graft-written inlineStr workbook"""
    zf = zipfile.ZipFile(path)
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    RNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    rel = {r.get("Id"): r.get("Target") for r in rels.findall(f"{RNS}Relationship")}
    out = []
    for sh in wb.find(f"{NS}sheets").findall(f"{NS}sheet"):
        target = rel[sh.get(RID)]
        if not target.startswith("xl/"):
            target = "xl/" + target
        ws = ET.fromstring(zf.read(target))
        rows = []
        for row in ws.find(f"{NS}sheetData").findall(f"{NS}row"):
            cells = []
            for c in row.findall(f"{NS}c"):
                ref = c.get("r")
                col = 0
                for ch in re.match(r"([A-Z]+)", ref).group(1):
                    col = col * 26 + (ord(ch) - 64)
                col -= 1
                while len(cells) < col:
                    cells.append("")
                if c.get("t") == "inlineStr":
                    t = c.find(f"{NS}is/{NS}t")
                    cells.append(t.text or "")
                else:
                    v = c.find(f"{NS}v")
                    cells.append(v.text if v is not None else "")
            rows.append(cells)
        out.append((sh.get("name"), rows))
    return out


def col_name(i):
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def esc(s):
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
             .replace('"', "&quot;"))


INT_RE = re.compile(r"^-?\d{1,15}$")


def encode(sheets, out_path):
    shared = []          # unique strings in first-seen order
    shared_idx = {}

    def sidx(s):
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    sheet_xml = []
    for snum, (name, rows) in enumerate(sheets, 1):
        maxc = max((len(r) for r in rows), default=1)
        dim = f"A1:{col_name(max(maxc - 1, 0))}{max(len(rows), 1)}"
        body = []
        for ri, row in enumerate(rows, 1):
            cells = []
            for ci, val in enumerate(row):
                ref = f"{col_name(ci)}{ri}"
                if val == "":
                    continue  # Excel omits truly empty cells
                if val in ("true", "false"):
                    cells.append(f'<c r="{ref}" s="1" t="b"><v>'
                                 f'{1 if val == "true" else 0}</v></c>')
                elif INT_RE.match(val):
                    cells.append(f'<c r="{ref}" s="2"><v>{val}</v></c>')
                else:
                    cells.append(f'<c r="{ref}" s="3" t="s"><v>{sidx(val)}</v></c>')
            body.append(f'<row r="{ri}" spans="1:{maxc}" x14ac:dyDescent="0.25">'
                        + "".join(cells) + "</row>")
        sheet_xml.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\r\n'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" '
            'xmlns:mc="http://schemas.openxmlformats.org/markup-compatibility/2006" '
            'xmlns:x14ac="http://schemas.microsoft.com/office/spreadsheetml/2009/9/ac" '
            'xmlns:xr="http://schemas.microsoft.com/office/spreadsheetml/2014/revision" '
            'mc:Ignorable="x14ac xr">'
            f'<dimension ref="{dim}"/>'
            '<sheetViews><sheetView workbookViewId="0"/></sheetViews>'
            '<sheetFormatPr defaultRowHeight="15" x14ac:dyDescent="0.25"/>'
            f'<cols><col min="1" max="{maxc}" width="12.42" customWidth="1"/></cols>'
            '<sheetData>' + "".join(body) + '</sheetData>'
            '<pageMargins left="0.7" right="0.7" top="0.75" bottom="0.75" '
            'header="0.3" footer="0.3"/></worksheet>')

    # sharedStrings: first entry split into RICH RUNS; the first entry
    # containing a CJK char carries a phonetic run decoders must skip
    sst = []
    did_rich = did_phon = False
    for s in shared:
        e = esc(s)
        if not did_rich and len(s) >= 4 and s.isascii():
            a, b = esc(s[:2]), esc(s[2:])
            sst.append(f'<si><r><rPr><b/><sz val="11"/><rFont val="Calibri"/>'
                       f'</rPr><t xml:space="preserve">{a}</t></r>'
                       f'<r><t xml:space="preserve">{b}</t></r></si>')
            did_rich = True
        elif not did_phon and any(ord(c) > 0x2E80 for c in s):
            sst.append(f'<si><t xml:space="preserve">{e}</t>'
                       f'<rPh sb="0" eb="1"><t>トウキョウ</t></rPh>'
                       f'<phoneticPr fontId="1" type="katakana"/></si>')
            did_phon = True
        else:
            sst.append(f'<si><t xml:space="preserve">{e}</t></si>')
    shared_xml = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\r\n'
                  '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
                  f'count="{len(shared)}" uniqueCount="{len(shared)}">'
                  + "".join(sst) + "</sst>")

    n = len(sheets)
    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\r\n'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
          '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          + "".join(f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>' for i in range(1, n + 1))
          + '<Override PartName="/xl/theme/theme1.xml" ContentType="application/vnd.openxmlformats-officedocument.theme+xml"/>'
          '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
          '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
          '<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>'
          '<Override PartName="/docProps/app.xml" ContentType="application/vnd.openxmlformats-officedocument.extended-properties+xml"/>'
          '</Types>')
    root_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\r\n'
                 '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                 '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
                 '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>'
                 '<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/extended-properties" Target="docProps/app.xml"/>'
                 '</Relationships>')
    core = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\r\n'
            '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:dcterms="http://purl.org/dc/terms/" '
            'xmlns:dcmitype="http://purl.org/dc/dcmitype/" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
            '<dc:creator>A Human In Excel</dc:creator><cp:lastModifiedBy>A Human In Excel</cp:lastModifiedBy>'
            '<dcterms:created xsi:type="dcterms:W3CDTF">2025-11-03T09:15:00Z</dcterms:created>'
            '<dcterms:modified xsi:type="dcterms:W3CDTF">2025-11-03T09:21:30Z</dcterms:modified>'
            '</cp:coreProperties>')
    app = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\r\n'
           '<Properties xmlns="http://schemas.openxmlformats.org/officeDocument/2006/extended-properties" '
           'xmlns:vt="http://schemas.openxmlformats.org/officeDocument/2006/docPropsVTypes">'
           '<Application>Microsoft Excel</Application><DocSecurity>0</DocSecurity>'
           '<ScaleCrop>false</ScaleCrop><SharedDoc>false</SharedDoc>'
           '<HyperlinksChanged>false</HyperlinksChanged><AppVersion>16.0300</AppVersion></Properties>')
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\r\n'
          '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" '
          'xmlns:mc="http://schemas.openxmlformats.org/markup-compatibility/2006" '
          'xmlns:x15="http://schemas.microsoft.com/office/spreadsheetml/2010/11/main" '
          'xmlns:xr="http://schemas.microsoft.com/office/spreadsheetml/2014/revision" '
          'xmlns:xr6="http://schemas.microsoft.com/office/spreadsheetml/2016/revision6" '
          'xmlns:xr10="http://schemas.microsoft.com/office/spreadsheetml/2016/revision10" '
          'xmlns:xr2="http://schemas.microsoft.com/office/spreadsheetml/2015/revision2" '
          'mc:Ignorable="x15 xr xr6 xr10 xr2">'
          '<fileVersion appName="xl" lastEdited="7" lowestEdited="7" rupBuild="27425"/>'
          '<workbookPr defaultThemeVersion="166925"/>'
          '<bookViews><workbookView xWindow="0" yWindow="0" windowWidth="28800" windowHeight="12225"/></bookViews>'
          '<sheets>'
          + "".join(f'<sheet name="{esc(nm)}" sheetId="{i}" r:id="rId{i}"/>'
                    for i, (nm, _) in enumerate(sheets, 1))
          + '</sheets><calcPr calcId="191029"/></workbook>')
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\r\n'
               '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
               + "".join(f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
                         for i in range(1, n + 1))
               + f'<Relationship Id="rId{n+1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/theme" Target="theme/theme1.xml"/>'
               f'<Relationship Id="rId{n+2}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
               f'<Relationship Id="rId{n+3}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
               '</Relationships>')
    styles = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\r\n'
              '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
              '<fonts count="2"><font><sz val="11"/><color theme="1"/><name val="Calibri"/><family val="2"/></font>'
              '<font><b/><sz val="11"/><color theme="1"/><name val="Calibri"/><family val="2"/></font></fonts>'
              '<fills count="3"><fill><patternFill patternType="none"/></fill>'
              '<fill><patternFill patternType="gray125"/></fill>'
              '<fill><patternFill patternType="solid"><fgColor rgb="FFFFFF00"/><bgColor indexed="64"/></patternFill></fill></fills>'
              '<borders count="1"><border><left/><right/><top/><bottom/><diagonal/></border></borders>'
              '<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>'
              '<cellXfs count="4"><xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>'
              '<xf numFmtId="0" fontId="1" fillId="0" borderId="0" xfId="0" applyFont="1"/>'
              '<xf numFmtId="1" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>'
              '<xf numFmtId="0" fontId="0" fillId="2" borderId="0" xfId="0" applyFill="1"/></cellXfs>'
              '<cellStyles count="1"><cellStyle name="Normal" xfId="0" builtinId="0"/></cellStyles></styleSheet>')
    theme = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\r\n'
             '<a:theme xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" name="Office Theme">'
             '<a:themeElements><a:clrScheme name="Office"><a:dk1><a:sysClr val="windowText" lastClr="000000"/></a:dk1>'
             '<a:lt1><a:sysClr val="window" lastClr="FFFFFF"/></a:lt1><a:dk2><a:srgbClr val="44546A"/></a:dk2>'
             '<a:lt2><a:srgbClr val="E7E6E6"/></a:lt2><a:accent1><a:srgbClr val="4472C4"/></a:accent1>'
             '<a:accent2><a:srgbClr val="ED7D31"/></a:accent2><a:accent3><a:srgbClr val="A5A5A5"/></a:accent3>'
             '<a:accent4><a:srgbClr val="FFC000"/></a:accent4><a:accent5><a:srgbClr val="5B9BD5"/></a:accent5>'
             '<a:accent6><a:srgbClr val="70AD47"/></a:accent6><a:hlink><a:srgbClr val="0563C1"/></a:hlink>'
             '<a:folHlink><a:srgbClr val="954F72"/></a:folHlink></a:clrScheme>'
             '<a:fontScheme name="Office"><a:majorFont><a:latin typeface="Calibri Light"/><a:ea typeface=""/><a:cs typeface=""/></a:majorFont>'
             '<a:minorFont><a:latin typeface="Calibri"/><a:ea typeface=""/><a:cs typeface=""/></a:minorFont></a:fontScheme>'
             '<a:fmtScheme name="Office"><a:fillStyleLst><a:solidFill><a:schemeClr val="phClr"/></a:solidFill>'
             '<a:solidFill><a:schemeClr val="phClr"/></a:solidFill><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:fillStyleLst>'
             '<a:lnStyleLst><a:ln><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:ln>'
             '<a:ln><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:ln>'
             '<a:ln><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:ln></a:lnStyleLst>'
             '<a:effectStyleLst><a:effectStyle><a:effectLst/></a:effectStyle><a:effectStyle><a:effectLst/></a:effectStyle>'
             '<a:effectStyle><a:effectLst/></a:effectStyle></a:effectStyleLst>'
             '<a:bgFillStyleLst><a:solidFill><a:schemeClr val="phClr"/></a:solidFill>'
             '<a:solidFill><a:schemeClr val="phClr"/></a:solidFill><a:solidFill><a:schemeClr val="phClr"/></a:solidFill></a:bgFillStyleLst>'
             '</a:fmtScheme></a:themeElements></a:theme>')

    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/theme/theme1.xml", theme)
        z.writestr("xl/styles.xml", styles)
        z.writestr("xl/sharedStrings.xml", shared_xml)
        for i, x in enumerate(sheet_xml, 1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", x)
        z.writestr("docProps/core.xml", core)
        z.writestr("docProps/app.xml", app)


if __name__ == "__main__":
    sheets = read_sheets(sys.argv[1])
    encode(sheets, sys.argv[2])
    print(f"encoded {len(sheets)} sheets -> {sys.argv[2]}")
