"""Human-readable lookup tables (ETSI TS 101 756): programme types,
languages, country ids.

Parity surface: reference src/dab/constants/{programme_type_table.h,
language_table.h, country_table.h}. Programme types use international table
id 1 (Europe) / 2 (North America); languages are table 9/10; countries key
on (extended country code, country id).
"""

# Table 12: programme type codes, international table 1 (Europe)
PROGRAMME_TYPES_EU = [
    "None", "News", "Current Affairs", "Information", "Sport", "Education",
    "Drama", "Culture", "Science", "Varied", "Pop Music", "Rock Music",
    "Easy Listening", "Light Classical", "Serious Classical", "Other Music",
    "Weather", "Finance", "Children's", "Social Affairs", "Religion",
    "Phone In", "Travel", "Leisure", "Jazz Music", "Country Music",
    "National Music", "Oldies Music", "Folk Music", "Documentary", "", "",
]

# international table 2 (North America)
PROGRAMME_TYPES_NA = [
    "None", "News", "Information", "Sports", "Talk", "Rock", "Classic Rock",
    "Adult Hits", "Soft Rock", "Top 40", "Country", "Oldies", "Soft",
    "Nostalgia", "Jazz", "Classical", "Rhythm and Blues", "Soft R&B",
    "Foreign Language", "Religious Music", "Religious Talk", "Personality",
    "Public", "College", "", "", "", "", "", "Weather", "Emergency Test",
    "Emergency",
]


def programme_type_label(code: int, international_table_id: int = 1) -> str:
    table = PROGRAMME_TYPES_NA if international_table_id == 2 else PROGRAMME_TYPES_EU
    return table[code] if 0 <= code < len(table) else ""


# Tables 9+10: language codes (the commonly broadcast subset; others -> hex)
LANGUAGES = {
    0x00: "Unknown", 0x01: "Albanian", 0x02: "Breton", 0x03: "Catalan",
    0x04: "Croatian", 0x05: "Welsh", 0x06: "Czech", 0x07: "Danish",
    0x08: "German", 0x09: "English", 0x0A: "Spanish", 0x0B: "Esperanto",
    0x0C: "Estonian", 0x0D: "Basque", 0x0E: "Faroese", 0x0F: "French",
    0x10: "Frisian", 0x11: "Irish", 0x12: "Gaelic", 0x13: "Galician",
    0x14: "Icelandic", 0x15: "Italian", 0x16: "Sami", 0x17: "Latin",
    0x18: "Latvian", 0x19: "Luxembourgian", 0x1A: "Lithuanian",
    0x1B: "Hungarian", 0x1C: "Maltese", 0x1D: "Dutch", 0x1E: "Norwegian",
    0x1F: "Occitan", 0x20: "Polish", 0x21: "Portuguese", 0x22: "Romanian",
    0x23: "Romansh", 0x24: "Serbian", 0x25: "Slovak", 0x26: "Slovene",
    0x27: "Finnish", 0x28: "Swedish", 0x29: "Turkish", 0x2A: "Flemish",
    0x2B: "Walloon", 0x40: "Background", 0x45: "Zulu", 0x46: "Vietnamese",
    0x47: "Uzbek", 0x48: "Urdu", 0x49: "Ukrainian", 0x4A: "Thai",
    0x4B: "Telugu", 0x4C: "Tatar", 0x4D: "Tamil", 0x4E: "Tadzhik",
    0x4F: "Swahili", 0x50: "Sranan Tongo", 0x51: "Somali", 0x52: "Sinhalese",
    0x53: "Shona", 0x54: "Serbo-Croat", 0x55: "Rusyn", 0x56: "Russian",
    0x57: "Quechua", 0x58: "Pushtu", 0x59: "Punjabi", 0x5A: "Persian",
    0x5B: "Papiamento", 0x5C: "Oriya", 0x5D: "Nepali", 0x5E: "Ndebele",
    0x5F: "Marathi", 0x60: "Moldavian", 0x61: "Malaysian", 0x62: "Malagasay",
    0x63: "Macedonian", 0x64: "Laotian", 0x65: "Korean", 0x66: "Khmer",
    0x67: "Kazakh", 0x68: "Kannada", 0x69: "Japanese", 0x6A: "Indonesian",
    0x6B: "Hindi", 0x6C: "Hebrew", 0x6D: "Hausa", 0x6E: "Gurani",
    0x6F: "Gujurati", 0x70: "Greek", 0x71: "Georgian", 0x72: "Fulani",
    0x73: "Dari", 0x74: "Chuvash", 0x75: "Chinese", 0x76: "Burmese",
    0x77: "Bulgarian", 0x78: "Bengali", 0x79: "Belorussian", 0x7A: "Bambora",
    0x7B: "Azerbaijani", 0x7C: "Assamese", 0x7D: "Armenian", 0x7E: "Arabic",
    0x7F: "Amharic",
}


def language_label(code: int) -> str:
    return LANGUAGES.get(code, f"0x{code:02X}")


# Annex: country ids keyed by (ECC, country id nibble) — European +
# common worldwide allocations (reference country_table.h)
COUNTRIES = {
    (0xE0, 0x9): "Albania", (0xE0, 0x2): "Algeria", (0xE0, 0x3): "Andorra",
    (0xE0, 0xA): "Austria", (0xE0, 0x6): "Belgium",
    (0xE3, 0xF): "Bosnia Herzegovina", (0xE1, 0x8): "Bulgaria",
    (0xE3, 0xC): "Croatia", (0xE1, 0x2): "Cyprus",
    (0xE2, 0x2): "Czech Republic", (0xE1, 0x9): "Denmark",
    (0xE4, 0x2): "Estonia", (0xE1, 0x6): "Finland", (0xE1, 0xF): "France",
    (0xE0, 0xD): "Germany", (0xE0, 0x1): "Germany",
    (0xE1, 0x1): "Greece",
    (0xE0, 0xB): "Hungary", (0xE2, 0xA): "Iceland", (0xE3, 0x2): "Ireland",
    (0xE0, 0x5): "Italy", (0xE3, 0x9): "Latvia", (0xE2, 0xC): "Lithuania",
    (0xE1, 0x7): "Luxembourg", (0xE0, 0xC): "Malta",
    (0xE1, 0x4): "Moldova", (0xE0, 0x8): "Netherlands",
    (0xE2, 0xF): "Norway", (0xE2, 0x3): "Poland", (0xE4, 0x8): "Portugal",
    (0xE1, 0xE): "Romania", (0xE0, 0x7): "Russia", (0xE4, 0xD): "San Marino",
    (0xE2, 0x5): "Serbia", (0xE2, 0x6): "Slovakia", (0xE4, 0x9): "Slovenia",
    (0xE2, 0xE): "Spain", (0xE3, 0xE): "Sweden",
    (0xE1, 0xA): "Gibraltar", (0xE2, 0x4): "Switzerland",
    (0xE3, 0x1): "Turkey", (0xE4, 0x6): "Ukraine",
    (0xE1, 0xC): "United Kingdom",
    (0xA0, 0x1): "USA", (0xA0, 0x2): "USA", (0xA0, 0x3): "USA",
    (0xA0, 0xB): "Canada", (0xA0, 0xC): "Canada",
    (0xF0, 0x1): "Australia", (0xF1, 0x9): "New Zealand",
    (0xF2, 0x9): "Japan", (0xF2, 0xE): "South Korea",
    (0xF0, 0xC): "China", (0xF0, 0x5): "India",
    (0xD0, 0xA): "South Africa",
}


def country_label(ecc: int, country_id: int) -> str:
    return COUNTRIES.get((ecc, country_id), f"ECC {ecc:02X}/{country_id:X}")
