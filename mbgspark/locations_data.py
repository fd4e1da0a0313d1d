"""The reference's full Indonesian location dictionary + first-match dim builder.

Data: ``config/indonesia_locations.json`` (38 provinces / 456
kabupaten & kota — public Indonesian administrative divisions), loaded by
``load_indonesian_locations`` (utils.py:300-333). The matching semantics of
``detect_location_from_text`` (utils.py:336-437) are flattened into ONE
priority-ordered term table (province, city, dict_order, term):

- per province, two tiers mirroring the reference loop's break structure:
  tier A — the exact city names (Case 1, utils.py:366-371) in city order:
     an exact match BREAKS the city loop, so the first exact match wins
     and beats every part/abbreviation match in the province;
  tier B — each whitespace part of a name longer than 2 chars (Case 2,
     utils.py:373-381) and the abbreviations (Case 3 map,
     utils.py:384-394) in REVERSED city order: these matches do NOT break
     the city loop, so the reference keeps overwriting detected_city and
     the LAST matching city wins ("jakarta" alone resolves to Jakarta
     Timur, the last DKI city carrying that part). The reference's Case-3
     guard `province in full_name` compares the original-case province to
     a lowercase city so it never fires there — we ship the map as working
     alias rows, the documented intent;
- then, BELOW every city row, the province-name fallback (utils.py:404-432):
  the province name itself, then each of its variation forms
  (utils.py:414-424: no-space form, dki/di/provinsi prefix strips, and the
  nt/kalt/sul/mal contractions — shipped verbatim, odd forms included).
  Province rows carry city=None: they only win when no city term matched,
  because every city row has a lower dict_order.

Duplicate terms keep only their FIRST (lowest-order) row: under
min(dict_order) first-match, later duplicates are unreachable — pruning is
semantics-preserving and keeps the dim ~40% smaller.
"""

from __future__ import annotations

# province -> [kabupaten/kota ...] — config/indonesia_locations.json
INDONESIA_LOCATIONS: dict[str, list[str]] = {
    'Aceh': [
        'Banda Aceh', 'Sabang', 'Lhokseumawe', 'Langsa', 'Subulussalam',
        'Meulaboh', 'Calang', 'Tapak Tuan', 'Simeulue', 'Sinabang',
        'Blangpidie', 'Kuala Batee', 'Kota Bakti', 'Idi Rayeuk',
    ],
    'Sumatera Utara': [
        'Medan', 'Pematangsiantar', 'Sibolga', 'Tanjung Balai', 'Binjai',
        'Padangsidimpuan', 'Gunungsitoli', 'Lubuk Pakam', 'Perbaungan',
        'Kisaran', 'Stabat', 'Pangururan', 'Rantau Prapat', 'Teluk Nibung',
    ],
    'Sumatera Barat': [
        'Padang', 'Bukittinggi', 'Padang Panjang', 'Sawahlunto', 'Parittiga',
        'Solok', 'Sungai Penuh', 'Pariaman', 'Payakumbuh', 'Pekanbaru',
        'Dumai', 'Bengkalis', 'Tanjung Pinang', 'Riau',
    ],
    'Riau': [
        'Pekanbaru', 'Dumai', 'Bengkalis', 'Tanjung Pinang', 'Selat Panjang',
        'Bagan Siapi-api', 'Lirik', 'Rengat', 'Pangkalan Kerinci',
        'Ujung Batu', 'Kampar', 'Sungai Apit', 'Minas',
    ],
    'Jambi': [
        'Jambi', 'Sungai Penuh', 'Kerinci', 'Sarolangun', 'Bangko',
        'Muara Bungo', 'Simpang Empat', 'Muara Tebo', 'Pangkal Pinang',
        'Koba', 'Mentok', 'Sungai Liat',
    ],
    'Sumatera Selatan': [
        'Palembang', 'Lubuklinggau', 'Pagar Alam', 'Prabumulih',
        'Muara Enim', 'Lahat', 'Pangkal Pinang', 'Martapura', 'Baturaja',
        'Sekayu', 'Rantau Prapat', 'Kayu Agung', 'Manna', 'Kepahiang',
    ],
    'Bengkulu': [
        'Bengkulu', 'Kaur', 'Kepahiang', 'Lebong', 'Mukomuko',
        'Rejang Lebong', 'Seluma', 'Tais', 'Putri Hijau',
    ],
    'Lampung': [
        'Bandar Lampung', 'Metro', 'Kotabumi', 'Kalianda', 'Blambangan Umpu',
        'Liwa', 'Sumber Jaya', 'Metro Kibang', 'Gedung Tataan', 'Pringsewu',
        'Kota Agung', 'Pandawa',
    ],
    'Kepulauan Bangka Belitung': [
        'Pangkal Pinang', 'Tanjung Pandan', 'Mentok', 'Sungai Liat',
        'Muntok', 'Koba', 'Lepar Pongok', 'Koba Timur',
    ],
    'Kepulauan Riau': [
        'Tanjung Pinang', 'Batam', 'Bintan', 'Karimun', 'Anambas', 'Lingga',
        'Natuna', 'Singkep', 'Dabo Singkep',
    ],
    'DKI Jakarta': [
        'Jakarta Pusat', 'Jakarta Utara', 'Jakarta Barat', 'Jakarta Selatan',
        'Jakarta Timur', 'Kepulauan Seribu',
    ],
    'Jawa Barat': [
        'Bandung', 'Bekasi', 'Sukabumi', 'Cianjur', 'Cirebon', 'Depok',
        'Karawang', 'Cimahi', 'Tasikmalaya', 'Banjar', 'Purwakarta',
        'Subang', 'Kuningan', 'Indramayu', 'Majalengka', 'Sumedang', 'Garut',
        'Ciamis', 'Soreang', 'Ngamprah',
    ],
    'Jawa Tengah': [
        'Semarang', 'Solo', 'Surakarta', 'Yogyakarta', 'Magelang',
        'Pekalongan', 'Tegal', 'Salatiga', 'Purwokerto', 'Purbalingga',
        'Banjarnegara', 'Wonosobo', 'Sleman', 'Bantul', 'Kulon Progo',
        'Gunung Kidul', 'Klaten', 'Sragen', 'Grobogan', 'Pati', 'Kudus',
        'Jepara', 'Demak', 'Kendal', 'Batang', 'Pemalang', 'Tegal', 'Brebes',
    ],
    'DI Yogyakarta': [
        'Yogyakarta', 'Sleman', 'Bantul', 'Kulon Progo', 'Gunung Kidul',
    ],
    'Jawa Timur': [
        'Surabaya', 'Malang', 'Probolinggo', 'Madiun', 'Kediri', 'Blitar',
        'Pasuruan', 'Mojokerto', 'Batu', 'Lamongan', 'Gresik', 'Bangkalan',
        'Sampang', 'Pamekasan', 'Sumenep', 'Sidoarjo', 'Mojokerto',
        'Lumajang', 'Jember', 'Bondowoso', 'Banyuwangi', 'Purwodadi',
        'Ngawi', 'Magetan', 'Pacitan', 'Ponorogo', 'Trenggalek',
        'Tulungagung', 'Blitar', 'Kediri',
    ],
    'Banten': [
        'Tangerang', 'Cilegon', 'Serang', 'Tangerang Selatan', 'Pandeglang',
        'Lebak', 'Tangerang', 'Serang',
    ],
    'Bali': [
        'Denpasar', 'Bangli', 'Karangasem', 'Klungkung', 'Tabanan', 'Badung',
        'Gianyar', 'Jembrana', 'Buleleng', 'Singaraja', 'Amlapura',
    ],
    'Nusa Tenggara Barat': [
        'Mataram', 'Bima', 'Selong', 'Praya', 'Taliwang', 'Sumbawa Besar',
        'Waingapu', 'Wambugu',
    ],
    'Nusa Tenggara Timur': [
        'Kupang', 'Ende', 'Maumere', 'Ruteng', 'Labuhan Bajo', 'Kota Baru',
        'Larantuka', 'Atambua', 'Waingapu', 'Soe', 'Kefamenanu', 'Kota Ledo',
    ],
    'Kalimantan Barat': [
        'Pontianak', 'Singkawang', 'Sintang', 'Sanggau', 'Ketapang',
        'Kubu Raya', 'Kapuas Hulu', 'Landak', 'Sekadau', 'Melawi',
        'Katingan', 'Pulang Pisau',
    ],
    'Kalimantan Tengah': [
        'Palangka Raya', 'Sampit', 'Kuala Kapuas', 'Kuala Pembuang',
        'Pangkalan Bun', 'Buntok', 'Muara Teweh', 'Sungai Raya',
        'Banjarmasin', 'Banjarbaru', 'Kandangan', 'Barabai', 'Amuntai',
        'Tapin',
    ],
    'Kalimantan Selatan': [
        'Banjarmasin', 'Banjarbaru', 'Kandangan', 'Barabai', 'Amuntai',
        'Tapin', 'Paringin', 'Pulang Pisau', 'Kapuas', 'Kotabaru',
        'Sungai Tabuk', 'Martapura', 'Pelaihari',
    ],
    'Kalimantan Timur': [
        'Samarinda', 'Balikpapan', 'Bontang', 'Tenggarong', 'Sangatta',
        'Sendawar', 'Sanggata', 'Muara Badak', 'Palaran', 'Paser', 'Berau',
        'Tanjung Redep', 'Kutai Timur', 'Kutai Barat', 'Kutai Kartanegara',
    ],
    'Kalimantan Utara': [
        'Tarakan', 'Tanjung Selor', 'Nunukan', 'Tana Tidung', 'Malinau',
        'Kutai Barat', 'Kutai Timur', 'Bulungan',
    ],
    'Sulawesi Utara': [
        'Manado', 'Bitung', 'Tomohon', 'Kotamobagu', 'Kauditan', 'Airmadidi',
        'Kotabunan', 'Tahuna', 'Ondong Siau', 'Melonguane', 'Ratahan',
        'Tombatu', 'Kema',
    ],
    'Sulawesi Tengah': [
        'Palu', 'Luwuk', 'Poso', 'Tentena', 'Gorontalo', 'Marisa',
        'Tilamuta', 'Wonosari', 'Kolonedale', 'Banggai', 'Banggai Laut',
        'Tojo Una-Una', 'Parigi', 'Donggala',
    ],
    'Sulawesi Selatan': [
        'Makassar', 'Palopo', 'Parepare', 'Maros', 'Sungguminasa',
        'Bulukumba', 'Selayar', 'Majene', 'Pangkajene', 'Pinrang',
        'Sidenreng', 'Pinrang', 'Enrekang', 'Malili', 'Watampone',
    ],
    'Sulawesi Tenggara': [
        'Kendari', 'Bau-Bau', 'Kolaka', 'Wanggudu', 'Raha', 'Kendari Baru',
        'Unaaha', 'Wawonii', 'Andoolo', 'Lasusua', 'Wangi-Wangi', 'Korinci',
    ],
    'Gorontalo': [
        'Gorontalo', 'Luwuk', 'Tilamuta', 'Marisa', 'Kwandang', 'Sumalata',
        'Ponelo Kepulauan', 'Tapa', 'Kabila', 'Bonepantai',
    ],
    'Sulawesi Barat': [
        'Mamuju', 'Majene', 'Polewali', 'Mamuju Tengah', 'Pasangkayu',
        'Mamuju Utara', 'Tapin', 'Pinrang',
    ],
    'Maluku': [
        'Ambon', 'Pangkal Pinang', 'Tual', 'Dobo', 'Tanjung Karang',
        'Kisaran', 'Langgur', 'Waisai', 'Namlea', 'Bula', 'Masohi',
        'Kilmury', 'Saparua', 'Haruku',
    ],
    'Maluku Utara': [
        'Ternate', 'Tidore Kepulauan', 'Sofifi', 'Maba', 'Tobelo', 'Labuha',
        'Sanana', 'Galela', 'Loloda', 'Weda',
    ],
    'Papua Barat': [
        'Manokwari', 'Sorong', 'Fakfak', 'Kaimana', 'Ransiki', 'Bintuni',
        'Teminabuan', 'Kota Waisai', 'Kaimana', 'Argamakmur',
    ],
    'Papua': [
        'Jayapura', 'Abepura', 'Sentani', 'Wamena', 'Merauke', 'Timika',
        'Sarmi', 'Nabire', 'Paniai', 'Puncak Jaya', 'Biak', 'Numfor',
        'Yahukimo', 'Puncak', 'Deiyai',
    ],
    'Papua Tengah': [
        'Napua', 'Mulia', 'Puncak Jaya', 'Puncak', 'Yalimo', 'Lanny Jaya',
        'Pegunungan Bintang',
    ],
    'Papua Pegunungan': [
        'Kota Jayawijaya', 'Wamena', 'Kurima', 'Hubikosi', 'Mulia', 'Sinak',
        'Eragayam',
    ],
    'Papua Selatan': [
        'Kota Merauke', 'Kota Timika', 'Kokoda', 'Sota', 'Malagaineri',
        'Kaptel',
    ],
    'Papua Utara': [
        'Manokwari', 'Sorong', 'Kota Wasior', 'Kota Ransiki',
        'Kuala Kencana', 'Tembagapura',
    ],
}

