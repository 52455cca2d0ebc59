"""Execute the ACTUAL reference parsers and compare output with our port.

VERDICT r2 item 3: the listing parsers were the last hand-transcription risk
— behavior ports verified only against *ported* golden fixtures. Here the
reference's parser.py / parser_tiaofasi.py / pbc_monitor.extract_file_links
run in-process (bs4 mapped onto ``icrawler_spark.parsers.bs4compat``, a
BeautifulSoup facade over the repo's stdlib DOM) and every fixture asserts
entry-for-entry equality between the reference output and our parse
functions. Fixtures cover all three default-dialect tiers (table rows,
ul.txtlist, legacy flat links), the tiaofasi anchor walk, pagination
(text labels, onclick/tagname resolution, rel attributes, numeric pages),
and the filename-title repair in extract_file_links.

Fixture HTML adapted from the reference's own tests
(ref tests/test_pbc_monitor.py:26-155, tests/test_parser_tiaofasi.py:18-90)
plus harder cases (nested containers, generic labels, mixed attachments).
"""

from __future__ import annotations

import pytest

from icrawler_spark.parsers import listing

from tests._ref_stubs import install_reference_stubs, reference_available

if not reference_available():
    pytest.skip("reference checkout not present", allow_module_level=True)
install_reference_stubs()

from bs4 import BeautifulSoup  # noqa: E402 — resolves to bs4compat

from pbc_regulations.icrawler import parser as ref_parser  # noqa: E402
from pbc_regulations.icrawler import parser_tiaofasi as ref_tiaofasi  # noqa: E402
from pbc_regulations.icrawler import pbc_monitor as ref_monitor  # noqa: E402

LIST_URL = "http://example.com/list/index.html"
TIAOFASI_URL = "http://www.pbc.gov.cn/tiaofasi/144941/144951/index.html"


def _soup(html: str) -> BeautifulSoup:
    return BeautifulSoup(html, "html.parser")


DEFAULT_FIXTURES = {
    "table_rows": """
    <table>
      <tr><th>序号</th><th>标题</th><th>附件</th></tr>
      <tr>
        <td>1</td>
        <td><a href="detail/a1.html" title="中国人民银行公告〔2024〕第1号">公告第1号</a>
            <div class="gz_tit2">备注甲</div></td>
        <td><a href="/files/a1.pdf">pdf</a> <a href="/files/a1.doc">word</a></td>
      </tr>
      <tr>
        <td>2</td>
        <td><a href="detail/a2.html">办法第2号</a> （2024年修订）</td>
        <td><a href="/files/a2.pdf">2. 办法第2号</a>另注</td>
      </tr>
      <tr><td>x</td><td>非数字序号行跳过</td></tr>
    </table>
    """,
    "txtlist": """
    <ul class="txtlist">
      <li><a href="detail/b1/index.html" title="通知乙全称">通知乙</a>
          <span class="date">2024-01-02</span>
          <a href="/files/b1.docx">附件</a></li>
      <li><a href="detail/b2/index.html">办法丙</a><span class="date">2024-02-03</span></li>
    </ul>
    """,
    "legacy_links": """
    <html><body>
      <li>通知1：<a href="doc/notice1.PDF">下载</a></li>
      <div class="entry"><span>报告全文</span><a href="/files/report.docx">附件</a></div>
      <a href="index_2.html">下一页</a>
    </body></html>
    """,
    "legacy_multi_entry_container": """
    <div class="list">
      <p>标题甲 <a href="/files/a.pdf">下载</a></p>
      <p>标题乙 <a href="/files/b.pdf">下载</a></p>
    </div>
    """,
    "legacy_title_attribute": """
    <p>
      公告：<a href="/files/full.pdf" title="中国人民银行公告〔2024〕第2号关于货币政策工具的公告">中国人民银行公告〔2024〕第2号...</a>
    </p>
    """,
    "legacy_wps": """
    <div>
      <a href="/files/rule.wps">word下载</a>
    </div>
    """,
    "legacy_table_context": """
    <table>
      <tr>
        <td>中国人民银行公告〔2024〕第1号</td>
        <td><a href="/files/pbc1.doc">word</a> <a href="/files/pbc1.pdf">pdf</a></td>
      </tr>
    </table>
    """,
    "empty_and_junk": """
    <div><a href="javascript:void(0)">下载</a><a href="#">x</a><a>无链接</a></div>
    """,
    # deep ancestor context for attachment labels + generic-only labels
    "deep_ancestor_context": """
    <div>大标题区<div><span>人民银行令〔2023〕第9号</span><div>
      前置说明 <a href="/files/deep.pdf">点击下载</a></div></div></div>
    """,
    # previous_siblings accumulation with the ≥120-char break
    "long_previous_siblings": """
    <p>这是一段非常长的前置文字用于测试兄弟节点的聚合逻辑这是一段非常长的前置文字用于测试兄弟节点的聚合逻辑这是一段非常长的前置文字用于测试兄弟节点聚合
    <b>重要文件名称</b> <a href="/files/sib.docx">附件</a></p>
    """,
    # malformed: unclosed td/p, stray close tags, void elements
    "malformed_html": """
    <table><tr><td>1<td><a href="d/x.html">标题X</a><br><td><a href="/f/x.pdf">pdf</td></tr>
    </div></table><p>孤立 <a href="/f/y.doc">word下载</a>
    """,
    # entities and upper-case suffixes
    "entities_upper_suffix": """
    <li>&ldquo;条例&rdquo;&nbsp;全文：<a href="/F/UPPER.PDF">下载</a></li>
    """,
    # table row with extra note columns and cn-punctuated serial
    "extra_columns": """
    <table><tr><td> 3、</td><td><a href="det/z.html">重要办法</a></td>
    <td>备注列文字 <a href="/f/z.wps">wps</a></td><td>2024-05-06</td></tr></table>
    """,
}

TIAOFASI_FIXTURES = {
    "card_layout": """
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
    """,
    "attachments": """
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
    """,
    "pagination_and_out_of_scope": """
    <ul>
      <li><a href="2024/09/09/x/index.html">规定丁</a></li>
      <li><a href="http://other.example.com/y.html">站外链接</a></li>
      <li><a href="index_3.html">下一页</a></li>
    </ul>
    """,
}

PAGINATION_FIXTURES = {
    "onclick_tagname": """
    <div class="list_page">
      <a tagname="[HOMEPAGE]">首页</a>
      <a tagname="[PREVIOUSPAGE]">上一页</a>
      <a onclick="queryArticleByCondition(this,'/list/index2.html')" tagname="/list/index2.html">下一页</a>
      <a onclick="queryArticleByCondition(this,'/list/index4.html')" tagname="/list/index4.html">尾页</a>
    </div>
    """,
    "plain_hrefs": """
    <div class="list_page">
      <a href="index.html">首页</a>
      <a href="index_2.html">下一页</a>
      <a href="index_9.html">末页</a>
      <a href="index_3.html">3</a>
      <a href="detail/not_page.html">正文链接</a>
    </div>
    """,
    "rel_attributes": """
    <div>
      <a href="index_5.html" rel="next nofollow">更多</a>
      <a href="index_1.html" rel="prev">回看</a>
      <a href="index_7.html" data-page="7">七</a>
    </div>
    """,
    "no_container": """
    <p><a href="index_2.html">下页</a> <a href="detail/x.html">标题</a></p>
    """,
}


@pytest.mark.parametrize("name", sorted(DEFAULT_FIXTURES))
def test_default_dialect_entries_match_reference(name):
    html = DEFAULT_FIXTURES[name]
    ref = ref_parser.extract_listing_entries(LIST_URL, _soup(html))
    ours = listing.extract_listing_entries(LIST_URL, html, "default")
    assert ours == ref


@pytest.mark.parametrize("name", sorted(TIAOFASI_FIXTURES))
def test_tiaofasi_dialect_entries_match_reference(name):
    html = TIAOFASI_FIXTURES[name]
    ref = ref_tiaofasi.extract_listing_entries(TIAOFASI_URL, _soup(html))
    ours = listing.extract_listing_entries(TIAOFASI_URL, html, "tiaofasi")
    assert ours == ref


@pytest.mark.parametrize("name", sorted(PAGINATION_FIXTURES))
def test_pagination_meta_matches_reference(name):
    html = PAGINATION_FIXTURES[name]
    ref = ref_parser.extract_pagination_meta(LIST_URL, _soup(html), LIST_URL)
    ours = listing.extract_pagination_meta(LIST_URL, html, LIST_URL)
    assert ours == ref


@pytest.mark.parametrize("name", sorted(DEFAULT_FIXTURES))
def test_file_links_match_reference(name):
    html = DEFAULT_FIXTURES[name]
    ref = ref_monitor.extract_file_links(LIST_URL, _soup(html))
    ours = listing.extract_file_links(LIST_URL, html, "default")
    assert ours == ref


@pytest.mark.parametrize("name", sorted(TIAOFASI_FIXTURES))
def test_tiaofasi_file_links_match_reference(name):
    html = TIAOFASI_FIXTURES[name]
    ref = ref_tiaofasi.extract_file_links(TIAOFASI_URL, _soup(html))
    ours = listing.extract_file_links(TIAOFASI_URL, html, "tiaofasi")
    assert ours == ref
