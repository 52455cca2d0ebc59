"""Parser goldens ported from the reference pytest suite.

Sources (all /root/reference/tests/): test_pbc_monitor.py:26-45 (file links),
:70-90 (table context), :96-115 (title attr), :124-134 (wps),
:137-154 (onclick/tagname pagination), :385-423 (gz_tit2 remark),
:449-474 (nested containers), :476-519 (table entries golden),
:522-559 (pagination), test_parser_tiaofasi.py:18-73.
"""

from __future__ import annotations

from icrawler_spark.parsers import listing
from icrawler_spark.parsers.dom import parse_html

LIST_URL = "http://example.com/list/index.html"
TIAOFASI_URL = "http://www.pbc.gov.cn/tiaofasi/144941/144951/index.html"


def test_extract_file_links_basic():
    html = """
    <html><body>
      <li>通知1：<a href="doc/notice1.PDF">下载</a></li>
      <div class="entry"><span>报告全文</span><a href="/files/report.docx">附件</a></div>
      <a href="index_2.html">下一页</a>
    </body></html>
    """
    assert listing.extract_file_links(LIST_URL, html) == [
        ("http://example.com/list/doc/notice1.PDF", "通知1"),
        ("http://example.com/files/report.docx", "报告全文"),
    ]


def test_extract_file_links_table_context():
    html = """
    <table>
      <tr>
        <td>中国人民银行公告〔2024〕第1号</td>
        <td><a href="/files/pbc1.doc">word</a> <a href="/files/pbc1.pdf">pdf</a></td>
      </tr>
    </table>
    """
    assert listing.extract_file_links(LIST_URL, html) == [
        ("http://example.com/files/pbc1.doc", "中国人民银行公告〔2024〕第1号"),
        ("http://example.com/files/pbc1.pdf", "中国人民银行公告〔2024〕第1号"),
    ]


def test_extract_file_links_multi_entry_container():
    html = """
    <div class="list">
      <p>标题甲 <a href="/files/a.pdf">下载</a></p>
      <p>标题乙 <a href="/files/b.pdf">下载</a></p>
    </div>
    """
    assert listing.extract_file_links(LIST_URL, html) == [
        ("http://example.com/files/a.pdf", "标题甲"),
        ("http://example.com/files/b.pdf", "标题乙"),
    ]


def test_extract_file_links_prefers_title_attribute():
    html = """
    <p>
      公告：<a href="/files/full.pdf" title="中国人民银行公告〔2024〕第2号关于货币政策工具的公告">中国人民银行公告〔2024〕第2号...</a>
    </p>
    """
    assert listing.extract_file_links(LIST_URL, html) == [
        ("http://example.com/files/full.pdf",
         "中国人民银行公告〔2024〕第2号关于货币政策工具的公告"),
    ]


def test_extract_file_links_supports_wps_extension():
    html = '<div><a href="/files/rule.wps">word下载</a></div>'
    assert listing.extract_file_links(LIST_URL, html) == [
        ("http://example.com/files/rule.wps", "word下载"),
    ]


def test_extract_file_links_nested_containers_clean_name():
    html = """
    <div class="item">
      <div class="title">中国人民银行公告〔2025〕第9号</div>
      <div class="links">
        <a href="/files/notice2025.docx">下载word版</a>
        <a href="/files/notice2025.pdf">PDF下载</a>
      </div>
    </div>
    """
    assert listing.extract_file_links(LIST_URL, html) == [
        ("http://example.com/files/notice2025.docx", "中国人民银行公告〔2025〕第9号"),
        ("http://example.com/files/notice2025.pdf", "中国人民银行公告〔2025〕第9号"),
    ]


def test_extract_listing_entries_table_with_serials():
    html = """
    <table>
      <tr>
        <th>序号</th><th>标题</th><th>备注</th><th>下载</th>
      </tr>
      <tr>
        <td>1</td>
        <td><a href="detail1.html">公告甲</a> (2021年9月30日公布)</td>
        <td>自2022年1月1日起施行</td>
        <td>
          <a href="docs/notice1.doc">word版</a>
          <a href="docs/notice1.pdf">pdf版</a>
        </td>
      </tr>
    </table>
    """
    assert listing.extract_listing_entries(LIST_URL, html) == [
        {
            "serial": 1,
            "title": "公告甲",
            "remark": "(2021年9月30日公布) 自2022年1月1日起施行",
            "documents": [
                {"type": "html", "url": "http://example.com/list/detail1.html",
                 "title": "公告甲"},
                {"type": "word", "url": "http://example.com/list/docs/notice1.doc",
                 "title": "公告甲"},
                {"type": "pdf", "url": "http://example.com/list/docs/notice1.pdf",
                 "title": "公告甲"},
            ],
        }
    ]


def test_table_entry_gz_tit2_remark_and_title_attr():
    html = """
    <table>
      <tr>
        <td>1</td>
        <td>
          <div class="gz_tit2">这是备注内容</div>
          <a href="detail.html" title="中国人民银行公告甲">公告甲…</a>
        </td>
        <td><a href="/files/a.pdf">pdf</a></td>
      </tr>
    </table>
    """
    entries = listing.extract_listing_entries(LIST_URL, html)
    assert len(entries) == 1
    assert entries[0]["title"] == "中国人民银行公告甲"
    assert entries[0]["remark"] == "这是备注内容"
    pdf_docs = [d for d in entries[0]["documents"] if d["url"].endswith("a.pdf")]
    assert pdf_docs and pdf_docs[0]["title"] == "中国人民银行公告甲"


def test_extract_pagination_links():
    url = "http://www.pbc.gov.cn/zhengwugongkai/4081330/4406346/4406348/index.html"
    html = """
    <html><body>
      <a href="index.html">1</a>
      <a href="index_1.html">下一页</a>
      <a href="index_3.html">3</a>
      <a href="/zhengwugongkai/4081330/4406346/4406348/index_5.html">尾页</a>
    </body></html>
    """
    pages = listing.extract_pagination_links(url, html, url)
    assert "http://www.pbc.gov.cn/zhengwugongkai/4081330/4406346/4406348/index_1.html" in pages
    assert "http://www.pbc.gov.cn/zhengwugongkai/4081330/4406346/4406348/index_3.html" in pages


def test_pagination_ignores_detail_links_when_no_container():
    html = """
    <html><body>
      <ul>
        <li><a href="detail1.html">公告甲</a></li>
        <li><a href="detail2.html">公告乙</a></li>
      </ul>
      <div class="pager">
        <a href="index_2.html">下一页</a>
      </div>
    </body></html>
    """
    assert listing.extract_pagination_links(LIST_URL, html, LIST_URL) == [
        "http://example.com/list/index_2.html"
    ]


def test_pagination_meta_from_onclick_and_tagname():
    html = """
    <div class="list_page">
      <a tagname="[HOMEPAGE]">首页</a>
      <a tagname="[PREVIOUSPAGE]">上一页</a>
      <a onclick="queryArticleByCondition(this,'/list/index2.html')" tagname="/list/index2.html">下一页</a>
      <a onclick="queryArticleByCondition(this,'/list/index4.html')" tagname="/list/index4.html">尾页</a>
    </div>
    """
    meta = listing.extract_pagination_meta(LIST_URL, html, LIST_URL)
    assert meta["next"] == "http://example.com/list/index2.html"
    assert meta["last"] == "http://example.com/list/index4.html"
    assert meta["prev"] is None


def test_tiaofasi_card_layout():
    html = """
    <div class="list_box">
      <div class="list_item">
        <div class="info">
          <a href="2024/11/05/notice/index.html" title="关于公开征求意见的通知">关于公开征求意见的通知</a>
          <div class="meta">
            <span class="date">2024-11-05</span>
            <a href="/tiaofasi/144941/144951/2024/11/notice.pdf">附件下载</a>
          </div>
        </div>
      </div>
      <div class="list_item">
        <div class="info">
          <a href="2024/11/03/another/index.html">金融机构管理要求</a>
          <span class="time">2024年11月3日</span>
        </div>
      </div>
    </div>
    """
    entries = listing.extract_listing_entries(TIAOFASI_URL, html, dialect="tiaofasi")
    assert len(entries) == 2
    first = entries[0]
    assert first["title"] == "关于公开征求意见的通知"
    assert first["remark"] == "2024-11-05"
    assert first["documents"][0]["url"].endswith("2024/11/05/notice/index.html")
    assert first["documents"][0]["type"] == "html"
    assert any(d["url"].endswith("notice.pdf") for d in first["documents"])
    second = entries[1]
    assert second["title"] == "金融机构管理要求"
    assert second["remark"] == "2024年11月3日"


def test_tiaofasi_file_links():
    html = """
    <div class="list_box">
      <div class="list_item">
        <div class="info">
          <a href="2024/10/01/item/index.html">通知</a>
          <div class="attachments">
            <a href="/tiaofasi/144941/144951/files/a.docx">附件一</a>
            <a href="/tiaofasi/144941/144951/files/b.pdf">附件二</a>
          </div>
        </div>
      </div>
    </div>
    """
    links = listing.extract_file_links(TIAOFASI_URL, html, dialect="tiaofasi")
    assert sorted(u for u, _ in links) == [
        "http://www.pbc.gov.cn/tiaofasi/144941/144951/files/a.docx",
        "http://www.pbc.gov.cn/tiaofasi/144941/144951/files/b.pdf",
    ]


def test_discover_detail_attachments():
    html = """
    <html><body>
      <p><a href="files/annex1.pdf">附件1</a></p>
      <p><a href="files/annex2.doc" title="附件2标题"></a></p>
      <p><a href="other.html">другая страница</a></p>
      <p><a href="javascript:void(0)">按钮</a></p>
      <p><a href="mailto:x@y.z">mail</a></p>
    </body></html>
    """
    atts = listing.discover_detail_attachments("http://example.com/detail/index.html", html)
    assert [(a["url"], a["type"], a["title"]) for a in atts] == [
        ("http://example.com/detail/files/annex1.pdf", "pdf", "附件1"),
        ("http://example.com/detail/files/annex2.doc", "word", "附件2标题"),
    ]


def test_dom_get_text_and_leniency():
    root = parse_html("<div><p>a <b>b</b> c<br>d</p><p>unclosed")
    ps = root.find_all("p")
    assert len(ps) == 2
    assert ps[0].get_text(" ", strip=True) == "a b c d"
    assert ps[1].get_text(strip=True) == "unclosed"
