"""Locale plausibility scoring without third-party libraries.

The reference scores URL path segments such as ``/de/`` or ``/en_GB/``
with ``babel.Locale.parse`` (/root/reference/courlan/filters.py:180-191):
a segment parses to a Locale iff CLDR ships data for that identifier;
the parsed ``.language`` is then compared against the target language.
Unknown identifiers leave the score untouched.

We reproduce that contract with embedded tables derived from public
CLDR coverage (the identifiers for which CLDR publishes locale data):

* ``CLDR_LANGUAGES`` — bare two-letter codes with CLDR data.
* ``CLDR_LANG_TERRITORY`` — ``ll_TT`` identifiers with CLDR data.
  An identifier like ``en_XY`` has no CLDR data, so it does not parse
  (score unchanged), while ``en_HK`` does (score +1 for "en").

Non-string segments leave the score untouched, mirroring the
reference's TypeError path when a regex findall tuple is scored
(/root/reference/courlan/filters.py:189).
"""

from __future__ import annotations

from functools import lru_cache

# Two-letter ISO-639-1 codes for which CLDR ships a base locale file.
CLDR_LANGUAGES = frozenset(
    """
    af am ar as az be bg bm bn bo br bs ca ce cs cu cv cy da de dz ee el
    en eo es et eu fa ff fi fo fr fy ga gd gl gu gv ha he hi hr hu hy ia
    id ig ii is it ja jv ka ki kk kl km kn ko ks ku kw ky lb lg ln lo lt
    lu lv mg mi mk ml mn mr ms mt my nb nd ne nl nn no om or os pa pl ps
    pt qu rm rn ro ru rw sa sc sd se sg si sk sl sn so sq sr su sv sw ta
    te tg th ti tk to tr tt ug uk ur uz vi wo xh yi yo zh zu
    """.split()
)

# ll_TT identifiers with published CLDR data (common coverage subset).
CLDR_LANG_TERRITORY = frozenset(
    """
    ar_AE ar_BH ar_DZ ar_EG ar_IQ ar_JO ar_KW ar_LB ar_LY ar_MA ar_OM
    ar_QA ar_SA ar_SD ar_SY ar_TN ar_YE
    bn_BD bn_IN
    ca_AD ca_ES ca_FR ca_IT
    cs_CZ da_DK da_GL
    de_AT de_BE de_CH de_DE de_IT de_LI de_LU
    el_CY el_GR
    en_AE en_AG en_AI en_AS en_AT en_AU en_BB en_BE en_BI en_BM en_BS
    en_BW en_BZ en_CA en_CC en_CH en_CK en_CM en_CX en_CY en_DE en_DK
    en_DM en_ER en_FI en_FJ en_FK en_FM en_GB en_GD en_GG en_GH en_GI
    en_GM en_GU en_GY en_HK en_IE en_IL en_IM en_IN en_IO en_JE en_JM
    en_KE en_KI en_KN en_KY en_LC en_LR en_LS en_MG en_MH en_MO en_MP
    en_MS en_MT en_MU en_MW en_MY en_NA en_NF en_NG en_NL en_NR en_NU
    en_NZ en_PG en_PH en_PK en_PN en_PR en_PW en_RW en_SB en_SC en_SD
    en_SE en_SG en_SH en_SI en_SL en_SS en_SX en_SZ en_TC en_TK en_TO
    en_TT en_TV en_TZ en_UG en_UM en_US en_VC en_VG en_VI en_VU en_WS
    en_ZA en_ZM en_ZW
    es_AR es_BO es_BR es_BZ es_CL es_CO es_CR es_CU es_DO es_EC es_ES
    es_GQ es_GT es_HN es_MX es_NI es_PA es_PE es_PH es_PR es_PY es_SV
    es_US es_UY es_VE
    et_EE eu_ES fa_AF fa_IR fi_FI
    fr_BE fr_BF fr_BI fr_BJ fr_BL fr_CA fr_CD fr_CF fr_CG fr_CH fr_CI
    fr_CM fr_DJ fr_DZ fr_FR fr_GA fr_GF fr_GN fr_GP fr_GQ fr_HT fr_KM
    fr_LU fr_MA fr_MC fr_MF fr_MG fr_ML fr_MQ fr_MR fr_MU fr_NC fr_NE
    fr_PF fr_PM fr_RE fr_RW fr_SC fr_SN fr_SY fr_TD fr_TG fr_TN fr_VU
    fr_WF fr_YT
    ga_IE gl_ES gu_IN he_IL hi_IN hr_BA hr_HR hu_HU hy_AM
    id_ID is_IS it_CH it_IT it_SM it_VA ja_JP ka_GE kk_KZ km_KH kn_IN
    ko_KP ko_KR ky_KG lt_LT lv_LV mk_MK ml_IN mn_MN mr_IN ms_BN ms_MY
    ms_SG mt_MT my_MM nb_NO nb_SJ ne_IN ne_NP
    nl_AW nl_BE nl_BQ nl_CW nl_NL nl_SR nl_SX nn_NO
    pa_IN pl_PL ps_AF
    pt_AO pt_BR pt_CH pt_CV pt_GQ pt_GW pt_LU pt_MO pt_MZ pt_PT pt_ST
    pt_TL
    ro_MD ro_RO ru_BY ru_KG ru_KZ ru_MD ru_RU ru_UA
    si_LK sk_SK sl_SI so_DJ so_ET so_KE so_SO sq_AL sq_MK sq_XK
    sr_BA sr_ME sr_RS sr_XK sv_AX sv_FI sv_SE sw_CD sw_KE sw_TZ sw_UG
    ta_IN ta_LK ta_MY ta_SG te_IN th_TH tr_CY tr_TR uk_UA ur_IN ur_PK
    uz_AF uz_UZ vi_VN
    zh_CN zh_HK zh_MO zh_SG zh_TW
    """.split()
)


# ll_Ssss script locales with published CLDR data: URL segments like
# /zh-hans/ or /sr-latn-rs/ parse in babel (language = ll); a
# territory-only table misses them.
CLDR_LANG_SCRIPT = frozenset(
    """
    az_Cyrl az_Latn bs_Cyrl bs_Latn pa_Arab pa_Guru sr_Cyrl sr_Latn
    uz_Arab uz_Cyrl uz_Latn zh_Hans zh_Hant kk_Arab ky_Arab ky_Latn
    mn_Mong ms_Arab ha_Arab yo_BJ ff_Adlm ff_Latn sd_Arab sd_Deva
    su_Latn vai_Latn vai_Vaii
    """.split()
)


def _norm_script(piece: str) -> str:
    return piece[:1].upper() + piece[1:].lower()


@lru_cache(maxsize=4096)
def _parse_language(segment: str) -> str | None:
    """Return the language code a segment parses to, or None when the
    identifier has no locale data (or is malformed)."""
    delimiter = "_" if "_" in segment else "-"
    pieces = segment.split(delimiter)
    lang = pieces[0].lower()
    if len(pieces) == 1:
        return lang if lang in CLDR_LANGUAGES else None
    if len(pieces) == 2:
        if len(pieces[1]) == 4:  # script subtag (zh_Hans, sr_Latn, ...)
            ident = f"{lang}_{_norm_script(pieces[1])}"
            return lang if ident in CLDR_LANG_SCRIPT else None
        ident = f"{lang}_{pieces[1].upper()}"
        return lang if ident in CLDR_LANG_TERRITORY else None
    if len(pieces) == 3 and len(pieces[1]) == 4:
        # ll_Ssss_TT (sr_Latn_RS, zh_Hant_TW): CLDR publishes these
        # wherever the ll_Ssss base exists
        ident = f"{lang}_{_norm_script(pieces[1])}"
        return lang if ident in CLDR_LANG_SCRIPT else None
    return None


def score_language_segment(language: str, segment: object, score: int) -> int:
    """Adjust a plausibility score using a candidate locale segment.

    Parity target: ``langcodes_score``
    (/root/reference/courlan/filters.py:180-191) — +1 when the segment
    parses to the target language, -1 when it parses to another
    language, unchanged when it does not parse (or is not a string).
    """
    if not isinstance(segment, str):
        return score
    parsed = _parse_language(segment)
    if parsed is None:
        return score
    return score + 1 if parsed == language else score - 1
